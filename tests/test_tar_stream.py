"""ustar / WebDataset shard pins (functions/tar_stream — r11).
CPython's ``tarfile`` (USTAR_FORMAT) is the independent reference in
both directions; layout arithmetic, checksum tampering, long-name
prefix splitting, and the WebDataset adjacency contract are pinned
by hand."""

from __future__ import annotations

import io
import tarfile

import pytest

from data_warehouse_migration_spark.functions.tar_stream import (
    tar_members,
    tar_pack,
    webdataset_samples,
)

MEMBERS = [
    ("000017.txt", b"hello world"),
    ("000017.json", b'{"a": 1}'),
    ("000018.txt", b"x" * 600),   # spans two data blocks
    ("000019.txt", b""),          # zero-length member: no data block
]


def _stdlib_pack(members):
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        for name, data in members:
            ti = tarfile.TarInfo(name)
            ti.size = len(data)
            ti.mtime = 0
            w.addfile(ti, io.BytesIO(data))
    return buf.getvalue()


def test_ours_read_by_stdlib():
    tf = tarfile.open(fileobj=io.BytesIO(tar_pack(MEMBERS)))
    got = [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()]
    assert got == MEMBERS


def test_stdlib_read_by_ours():
    assert tar_members(_stdlib_pack(MEMBERS)) == MEMBERS


def test_layout_arithmetic():
    # 512·(n_headers + Σ ceil(size/512)) + 1024 — the gate's formula
    blob = tar_pack(MEMBERS)
    expect = 512 * (4 + 1 + 1 + 2 + 0) + 1024
    assert len(blob) == expect
    # deterministic: same members → same bytes
    assert blob == tar_pack(MEMBERS)


def test_long_name_prefix_split():
    long = "a/" * 60 + "file.txt"  # 128 chars: needs the prefix field
    blob = tar_pack([(long, b"d")])
    tf = tarfile.open(fileobj=io.BytesIO(blob))
    assert tf.getmembers()[0].name == long
    assert tar_members(blob) == [(long, b"d")]
    # unsplittable (no '/' within prefix reach) must raise, not wrap
    with pytest.raises(ValueError, match="too long"):
        tar_pack([("x" * 160, b"d")])


def test_checksum_verified():
    blob = bytearray(tar_pack(MEMBERS))
    blob[0] ^= 1  # flip a name byte; stored checksum now wrong
    with pytest.raises(ValueError, match="checksum"):
        tar_members(bytes(blob))


def test_truncated_member_raises():
    blob = tar_pack(MEMBERS)
    with pytest.raises(ValueError, match="truncated"):
        tar_members(blob[: 512 + 4])


def test_directories_skipped_unknown_typeflags_raise():
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as w:
        d = tarfile.TarInfo("dir/")
        d.type = tarfile.DIRTYPE
        d.mtime = 0
        w.addfile(d)
        ti = tarfile.TarInfo("dir/f.txt")
        ti.size = 1
        ti.mtime = 0
        w.addfile(ti, io.BytesIO(b"z"))
    assert tar_members(buf.getvalue()) == [("dir/f.txt", b"z")]
    # symlink: unsupported → raise, never silently skip
    buf2 = io.BytesIO()
    with tarfile.open(fileobj=buf2, mode="w", format=tarfile.USTAR_FORMAT) as w:
        ln = tarfile.TarInfo("lnk")
        ln.type = tarfile.SYMTYPE
        ln.linkname = "t"
        ln.mtime = 0
        w.addfile(ln)
    with pytest.raises(ValueError, match="typeflag"):
        tar_members(buf2.getvalue())


def test_webdataset_grouping():
    samples = webdataset_samples(tar_pack(MEMBERS))
    assert samples == [
        ("000017", {"txt": b"hello world", "json": b'{"a": 1}'}),
        ("000018", {"txt": b"x" * 600}),
        ("000019", {"txt": b""}),
    ]
    # multi-dot extensions keep everything after the FIRST dot
    s2 = webdataset_samples(tar_pack([("k.seg.png", b"p")]))
    assert s2 == [("k", {"seg.png": b"p"})]


def test_webdataset_non_adjacent_rejected():
    blob = tar_pack(
        [("a.txt", b"1"), ("b.txt", b"2"), ("a.json", b"3")]
    )
    with pytest.raises(ValueError, match="non-adjacent"):
        webdataset_samples(blob)


def test_targz_composition():
    from data_warehouse_migration_spark.functions.gzip_stream import (
        gzip_compress,
        gzip_decompress,
    )

    shard = tar_pack(MEMBERS)
    assert tar_members(gzip_decompress(gzip_compress(shard, "dynamic"))) == MEMBERS
    # stdlib reads our .tar.gz end to end
    tf = tarfile.open(fileobj=io.BytesIO(gzip_compress(shard, "fixed")), mode="r:gz")
    assert [(m.name, tf.extractfile(m).read()) for m in tf.getmembers()] == MEMBERS


def test_negative_size_field_rejected():
    # ADVICE r11: int(x, 8) accepts '-N' — a crafted negative size
    # walks the member scan backwards. Craft a header whose size field
    # reads -12 but whose checksum is self-consistent.
    blob = bytearray(tar_pack([("a.txt", b"x" * 12)]))
    h = bytearray(blob[:512])
    h[124:136] = b"-12".ljust(11, b" ") + b"\x00"
    h[148:156] = b" " * 8
    chk = sum(h)
    h[148:155] = f"{chk:06o}".encode() + b"\x00"
    h[155] = ord(" ")
    blob[:512] = h
    with pytest.raises(ValueError, match="octal size"):
        tar_members(bytes(blob))
