"""POSIX ustar (tar) shard framing, from scratch — the container
large training sets actually ship in: the WebDataset convention
stores each sample as ADJACENT members sharing a basename key
(``000017.jpg`` + ``000017.txt`` + ``000017.json``) inside fixed-size
tar shards, so a loader streams samples sequentially with no index.
This module implements the ustar layout (POSIX.1-1988 + the ustar
magic/prefix extensions) so the engine can both CUT shards and READ
them; ``.tar.gz`` shards compose with functions/gzip_stream.

Implemented from the public format alone:

- 512-byte header: name/mode/uid/gid/size/mtime as NUL-terminated
  octal text, checksum computed over the header with the checksum
  field blanked to spaces (stored as 6 octal digits + NUL + space —
  the historical quirk every reader expects), typeflag, ``ustar\\0``
  magic + ``00`` version, uname/gname, prefix for names > 100 bytes;
- data blocks padded to 512; end-of-archive = two zero blocks;
- reader verifies checksums, honors the prefix field, skips
  directory entries, and REJECTS typeflags it doesn't implement
  (GNU longname/longlink, PAX headers) instead of guessing.

Scale posture: shards are the unit of parallelism (one worker
streams one shard — the WebDataset access pattern); per-shard code
runs inside Arrow-batched ``mapInPandas``, zero shuffle.
"""

from __future__ import annotations

_BLOCK = 512


def _read_octal(field: bytes, what: str) -> int:
    """Parse an UNTRUSTED octal header field: octal digits only,
    non-negative. ``int(x, 8)`` alone accepts ``-N`` — a crafted
    negative size walks the member scan BACKWARDS into already-read
    bytes (ADVICE r11). Empty field reads as 0 (historical tar)."""
    token = field.split(b"\x00")[0].strip()
    if not token:
        return 0
    if any(c not in b"01234567" for c in token):
        raise ValueError(f"invalid octal {what} field: {token!r}")
    return int(token, 8)


def _octal(value: int, width: int) -> bytes:
    """NUL-terminated octal text field (width includes the NUL)."""
    s = f"{value:0{width - 1}o}"
    if len(s) > width - 1:
        raise ValueError(f"{value} does not fit an octal field of {width}")
    return s.encode() + b"\x00"


def _header(name: str, size: int, mtime: int = 0, mode: int = 0o644) -> bytes:
    nb = name.encode("utf-8")
    prefix = b""
    if len(nb) > 100:
        # split at a '/' so prefix + '/' + name reassembles exactly
        cut = nb[: 155 + 1].rfind(b"/")
        if cut <= 0 or len(nb) - cut - 1 > 100:
            raise ValueError(f"name too long for ustar: {name!r}")
        prefix, nb = nb[:cut], nb[cut + 1 :]
    h = bytearray(_BLOCK)
    h[0:100] = nb.ljust(100, b"\x00")
    h[100:108] = _octal(mode, 8)
    h[108:116] = _octal(0, 8)          # uid
    h[116:124] = _octal(0, 8)          # gid
    h[124:136] = _octal(size, 12)
    h[136:148] = _octal(mtime, 12)
    h[148:156] = b" " * 8              # checksum: spaces while summing
    h[156] = ord("0")                  # regular file
    h[257:263] = b"ustar\x00"
    h[263:265] = b"00"
    h[345 : 345 + len(prefix)] = prefix
    chksum = sum(h)
    h[148:155] = f"{chksum:06o}".encode() + b"\x00"
    h[155] = ord(" ")
    return bytes(h)


def tar_pack(members: list[tuple[str, bytes]], mtime: int = 0) -> bytes:
    """A ustar archive of regular files, deterministic (fixed mtime,
    uid/gid 0, mode 0644) so equal members give equal shard bytes."""
    out = bytearray()
    for name, data in members:
        out += _header(name, len(data), mtime=mtime)
        out += data
        pad = -len(data) % _BLOCK
        out += b"\x00" * pad
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)


def tar_members(data: bytes) -> list[tuple[str, bytes]]:
    """Walk an archive → ``[(name, payload)]`` for regular files;
    directories are skipped, checksums verified, unsupported member
    types raise (a loader that silently skips a PAX header corrupts
    the member after it)."""
    out: list[tuple[str, bytes]] = []
    pos = 0
    n = len(data)
    while pos + _BLOCK <= n:
        h = data[pos : pos + _BLOCK]
        if h == b"\x00" * _BLOCK:  # end-of-archive marker
            break
        stored = _read_octal(h[148:156], "checksum")
        summed = sum(h[:148]) + 8 * 0x20 + sum(h[156:])
        if stored != summed:
            raise ValueError(f"tar header checksum mismatch at {pos}")
        size = _read_octal(h[124:136], "size")
        typeflag = chr(h[156])
        name = h[0:100].split(b"\x00")[0].decode("utf-8")
        if h[257:262] == b"ustar":
            prefix = h[345:500].split(b"\x00")[0].decode("utf-8")
            if prefix:
                name = prefix + "/" + name
        pos += _BLOCK
        payload = data[pos : pos + size]
        if len(payload) < size:
            raise ValueError("tar member data truncated")
        pos += size + (-size % _BLOCK)
        if typeflag in ("0", "\x00"):
            out.append((name, payload))
        elif typeflag == "5":
            continue  # directory
        else:
            raise ValueError(f"unsupported tar typeflag {typeflag!r}")
    return out


def webdataset_samples(
    data: bytes,
) -> list[tuple[str, dict[str, bytes]]]:
    """Group a shard's members into WebDataset samples: the key is
    the path up to the FIRST dot of the basename, the extension maps
    to the payload; adjacent members sharing a key form one sample
    (the convention's contract — a shard interleaving keys is
    malformed and raises)."""
    samples: list[tuple[str, dict[str, bytes]]] = []
    seen: set[str] = set()
    for name, payload in tar_members(data):
        base, _, _ = name.partition(".")
        ext = name[len(base) + 1 :]
        if samples and samples[-1][0] == base:
            samples[-1][1][ext] = payload
        else:
            if base in seen:
                raise ValueError(f"non-adjacent members for key {base!r}")
            seen.add(base)
            samples.append((base, {ext: payload}))
    return samples
