"""PCM audio containers (AU, AIFF/AIFC, WAV) + G.711 companding,
from scratch — the audio-INTEROP tier next to the FLAC rung: where
FLAC covers compressed audio with hand-derived pins, these three
containers are pinned against REAL files shipped in this container
(CPython's ``pluck-*`` test corpus: the same recording as AU, AIFF,
AIFC, and WAV at 8/16/24/32-bit PCM plus µ-law and A-law), so every
decoder is cross-checked against independent encoders AND against
the identical audio in the other containers.

Implemented from the public formats alone:

- **AU** (Sun audio): big-endian header (magic ``.snd``, data
  offset/size, encoding, rate, channels); encodings 1 (G.711 µ-law),
  2/3/4/5 (signed linear PCM 8/16/24/32, big-endian), 27 (A-law) —
  both directions;
- **AIFF/AIFC** (IFF): ``FORM`` grammar with even-byte padding,
  ``COMM`` (channels, frame count, sample size, the 80-bit IEEE 754
  extended-precision sample rate — encoded and decoded here from the
  bit layout), ``SSND`` (offset/blocksize + big-endian PCM); AIFC
  compression types ``NONE``, ``ulaw``/``ULAW``, ``alaw``/``ALAW``;
- **WAV** (RIFF): our own chunk walk (the ``wave`` stdlib module
  handles only a subset — notably not µ-law/A-law/float32), formats
  1 (PCM: unsigned 8-bit, signed little-endian 16/24/32), 3 (IEEE
  float32), 6 (A-law), 7 (µ-law), and the WAVE_FORMAT_EXTENSIBLE
  (0xFFFE) wrapper resolved through its SubFormat GUID;
- **G.711**: the Sun/CCITT reference algorithm on 14-bit (µ-law) /
  13-bit (A-law) domains — segment search, bias, complement masks —
  both directions. Pins: the published endpoint constants (µ-law
  0x00 → −32124, A-law full scale ±32256 /16/... per the expansion
  formulas), the all-codes value fixpoint, and the real companded
  ``pluck-ulaw.au`` / ``pluck-alaw.aifc`` decoding to within one
  quantization step of the same recording's PCM content. (Byte
  parity with the generating encoder is deliberately NOT claimed:
  G.711 implementations legitimately differ at bin boundaries — the
  real files sit ±1 code from ours on ~5% of samples, exactly the
  boundary population.)

Decoded samples are returned as ``(n_frames, channels)`` int32 (or
float64 for WAV float32) plus the rate and source bit depth — the
same contract as ``functions.flac.decode_flac``, so the multimodal
feature extractor treats every audio mime uniformly.

Scale posture: identical to the other codec rungs — containers are
serial per asset by design; assets are the parallelism unit inside
the Arrow-batched ``mapInPandas`` seam. Reference parity note: the
reference warehouse has no media surface — north-star territory.
"""

from __future__ import annotations

import struct

import numpy as np

# --- G.711 companding (Sun/CCITT reference algorithm) -------------------------

_ULAW_BIAS = 0x84  # 132, in the 16-bit domain
_ULAW_CLIP = 8159  # in the 14-bit domain
_SEG_UEND = [0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF, 0x1FFF]
_SEG_AEND = [0x1F, 0x3F, 0x7F, 0xFF, 0x1FF, 0x3FF, 0x7FF, 0xFFF]


def _ulaw2lin16(code: int) -> int:
    """One µ-law byte → 16-bit linear (the published expansion)."""
    u = ~code & 0xFF
    t = (((u & 0x0F) << 3) + _ULAW_BIAS) << ((u >> 4) & 0x07)
    return (_ULAW_BIAS - t) if (u & 0x80) else (t - _ULAW_BIAS)


def _lin2ulaw16(pcm: int) -> int:
    """16-bit linear → µ-law byte: the Sun 14-bit-domain algorithm
    (shift to 14 bits, bias, segment search, complement)."""
    pcm >>= 2
    if pcm < 0:
        pcm = -pcm
        mask = 0x7F
    else:
        mask = 0xFF
    if pcm > _ULAW_CLIP:
        pcm = _ULAW_CLIP
    pcm += _ULAW_BIAS >> 2
    seg = next((i for i, end in enumerate(_SEG_UEND) if pcm <= end), 8)
    if seg >= 8:
        return 0x7F ^ mask
    return ((seg << 4) | ((pcm >> (seg + 1)) & 0x0F)) ^ mask


def _alaw2lin16(code: int) -> int:
    """One A-law byte → 16-bit linear (the published expansion,
    13-bit domain shifted up by 3)."""
    a = code ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t += 0x108
        t <<= seg - 1
    return t if (a & 0x80) else -t


def _lin2alaw16(pcm: int) -> int:
    """16-bit linear → A-law byte (Sun 13-bit-domain algorithm)."""
    pcm >>= 3
    if pcm >= 0:
        mask = 0xD5
    else:
        mask = 0x55
        pcm = -pcm - 1
    seg = next((i for i, end in enumerate(_SEG_AEND) if pcm <= end), 8)
    if seg >= 8:
        return 0x7F ^ mask
    aval = seg << 4
    if seg < 2:
        aval |= (pcm >> 1) & 0x0F
    else:
        aval |= (pcm >> seg) & 0x0F
    return aval ^ mask


_ULAW_DEC = np.array([_ulaw2lin16(c) for c in range(256)], dtype=np.int32)
_ALAW_DEC = np.array([_alaw2lin16(c) for c in range(256)], dtype=np.int32)


def ulaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """Vectorized µ-law bytes → int32 16-bit-range linear samples."""
    return _ULAW_DEC[np.asarray(codes, dtype=np.uint8)]


def linear_to_ulaw(samples: np.ndarray) -> np.ndarray:
    s = np.asarray(samples, dtype=np.int64)
    return np.array([_lin2ulaw16(int(v)) for v in s.reshape(-1)],
                    dtype=np.uint8).reshape(s.shape)


def alaw_to_linear(codes: np.ndarray) -> np.ndarray:
    """Vectorized A-law bytes → int32 16-bit-range linear samples."""
    return _ALAW_DEC[np.asarray(codes, dtype=np.uint8)]


def linear_to_alaw(samples: np.ndarray) -> np.ndarray:
    s = np.asarray(samples, dtype=np.int64)
    return np.array([_lin2alaw16(int(v)) for v in s.reshape(-1)],
                    dtype=np.uint8).reshape(s.shape)


# --- shared PCM byte helpers ---------------------------------------------------


def _unpack_pcm(data: bytes, bits: int, n_ch: int, big_endian: bool) -> np.ndarray:
    """Packed signed PCM bytes → (frames, channels) int32.
    8-bit AU/AIFF PCM is SIGNED (unlike WAV's unsigned 8-bit)."""
    nbytes = bits // 8
    usable = len(data) - len(data) % (nbytes * n_ch)
    raw = np.frombuffer(data[:usable], dtype=np.uint8).reshape(-1, nbytes)
    order = range(nbytes) if big_endian else range(nbytes - 1, -1, -1)
    val = np.zeros(raw.shape[0], dtype=np.int64)
    for i in order:
        val = (val << 8) | raw[:, i]
    val = np.where(val >= (1 << (bits - 1)), val - (1 << bits), val)
    return val.reshape(-1, n_ch).astype(np.int32)


def _pack_pcm(samples: np.ndarray, bits: int, big_endian: bool) -> bytes:
    nbytes = bits // 8
    flat = np.asarray(samples, dtype=np.int64).reshape(-1)
    lim = 1 << (bits - 1)
    if flat.size and (flat.max() >= lim or flat.min() < -lim):
        raise ValueError(f"sample exceeds {bits}-bit range")
    out = bytearray()
    for v in flat:
        out += int(v).to_bytes(nbytes, "big" if big_endian else "little",
                               signed=True)
    return bytes(out)


# --- AU (Sun audio) -------------------------------------------------------------

_AU_PCM_ENCODINGS = {2: 8, 3: 16, 4: 24, 5: 32}
_AU_ENCODING_FOR_BITS = {8: 2, 16: 3, 24: 4, 32: 5}


def decode_au(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a ``.snd``/AU stream → (samples (n, ch) int32, rate,
    source bits). µ-law/A-law expand to 16-bit-range linear."""
    if payload[:4] != b".snd":
        raise ValueError("not an AU stream (bad magic)")
    _, offset, size, encoding, rate, n_ch = struct.unpack(">6I", payload[:24])
    if offset < 24 or offset > len(payload):
        raise ValueError("AU data offset out of range")
    if n_ch < 1:
        raise ValueError("AU channel count must be >= 1")
    end = len(payload) if size == 0xFFFFFFFF else min(len(payload), offset + size)
    data = payload[offset:end]
    if encoding == 1:
        flat = ulaw_to_linear(np.frombuffer(data, dtype=np.uint8))
        return flat.reshape(-1, n_ch), rate, 16
    if encoding == 27:
        flat = alaw_to_linear(np.frombuffer(data, dtype=np.uint8))
        return flat.reshape(-1, n_ch), rate, 16
    if encoding in _AU_PCM_ENCODINGS:
        bits = _AU_PCM_ENCODINGS[encoding]
        return _unpack_pcm(data, bits, n_ch, big_endian=True), rate, bits
    raise NotImplementedError(
        f"AU encoding {encoding} (only µ-law/A-law and linear PCM here)"
    )


def encode_au(
    samples: np.ndarray, rate: int, encoding: str = "pcm16"
) -> bytes:
    """Encode (n,) or (n, ch) samples → AU. ``encoding``: ``pcm8`` /
    ``pcm16`` / ``pcm24`` / ``pcm32`` / ``ulaw`` / ``alaw`` (the
    companded forms take 16-bit-range input)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n_ch = s.shape[1]
    if encoding == "ulaw":
        data = linear_to_ulaw(s.reshape(-1)).tobytes()
        enc = 1
    elif encoding == "alaw":
        data = linear_to_alaw(s.reshape(-1)).tobytes()
        enc = 27
    elif encoding.startswith("pcm"):
        bits = int(encoding[3:])
        if bits not in _AU_ENCODING_FOR_BITS:
            raise ValueError(f"unsupported AU encoding {encoding!r}")
        data = _pack_pcm(s, bits, big_endian=True)
        enc = _AU_ENCODING_FOR_BITS[bits]
    else:
        raise ValueError(f"unsupported AU encoding {encoding!r}")
    header = struct.pack(">4s5I", b".snd", 24, len(data), enc, rate, n_ch)
    return header + data


# --- 80-bit IEEE extended floats (the AIFF sample-rate field) -------------------


def _pack_float80(value: float) -> bytes:
    if value <= 0 or value != value or value == float("inf"):
        raise ValueError("AIFF sample rate must be a positive finite number")
    import math

    mant, exp = math.frexp(value)  # value = mant * 2^exp, mant in [0.5, 1)
    mantissa = int(mant * (1 << 64))  # top bit set (explicit integer bit)
    return struct.pack(">HQ", (exp - 1) + 16383, mantissa)


def _unpack_float80(raw: bytes) -> float:
    se, mantissa = struct.unpack(">HQ", raw[:10])
    sign = -1.0 if se & 0x8000 else 1.0
    exp = se & 0x7FFF
    if exp == 0 and mantissa == 0:
        return 0.0
    if exp == 0x7FFF:
        raise ValueError("non-finite AIFF sample rate")
    return sign * mantissa * 2.0 ** (exp - 16383 - 63)


# --- AIFF / AIFC ---------------------------------------------------------------


def decode_aiff(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode AIFF or AIFC → (samples (n, ch) int32, rate, source
    bits). AIFC compression ``NONE`` plus the G.711 pair; anything
    else (sowt, IMA4, float) raises with the type named."""
    if payload[:4] != b"FORM":
        raise ValueError("not an IFF/AIFF stream")
    form_type = payload[8:12]
    if form_type not in (b"AIFF", b"AIFC"):
        raise ValueError(f"FORM type {form_type!r} is not AIFF/AIFC")
    size = struct.unpack(">I", payload[4:8])[0]
    end = min(len(payload), 8 + size)

    comm = None
    ssnd = None
    pos = 12
    while pos + 8 <= end:
        ctype = payload[pos : pos + 4]
        clen = struct.unpack(">I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated {ctype!r} chunk")
        if ctype == b"COMM":
            comm = body
        elif ctype == b"SSND":
            ssnd = body
        pos += 8 + clen + (clen & 1)  # even-byte padding per IFF
    if comm is None or ssnd is None:
        raise ValueError("AIFF missing COMM or SSND")

    n_ch, n_frames, bits = struct.unpack(">hIh", comm[:8])
    rate = round(_unpack_float80(comm[8:18]))
    compression = b"NONE"
    if form_type == b"AIFC":
        if len(comm) < 22:
            raise ValueError("AIFC COMM missing the compression type")
        compression = comm[18:22]

    ss_offset, _blocksize = struct.unpack(">II", ssnd[:8])
    data = ssnd[8 + ss_offset :]

    if compression in (b"ulaw", b"ULAW"):
        flat = ulaw_to_linear(np.frombuffer(data, dtype=np.uint8))
        samples = flat.reshape(-1, n_ch)
        out_bits = 16
    elif compression in (b"alaw", b"ALAW"):
        flat = alaw_to_linear(np.frombuffer(data, dtype=np.uint8))
        samples = flat.reshape(-1, n_ch)
        out_bits = 16
    elif compression == b"NONE":
        if bits not in (8, 16, 24, 32):
            raise NotImplementedError(f"AIFF sample size {bits}")
        samples = _unpack_pcm(data, bits, n_ch, big_endian=True)
        out_bits = bits
    else:
        raise NotImplementedError(f"AIFC compression {compression!r}")
    if samples.shape[0] < n_frames:
        raise ValueError(
            f"SSND carries {samples.shape[0]} frames, COMM declares {n_frames}"
        )
    return samples[:n_frames], rate, out_bits


def encode_aiff(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Encode (n,) or (n, ch) PCM → a plain AIFF (big-endian, no
    compression)."""
    s = np.asarray(samples, dtype=np.int64)
    if s.ndim == 1:
        s = s[:, None]
    n_frames, n_ch = s.shape
    comm = struct.pack(">hIh", n_ch, n_frames, bits) + _pack_float80(float(rate))
    data = _pack_pcm(s, bits, big_endian=True)
    ssnd = struct.pack(">II", 0, 0) + data

    def chunk(fcc: bytes, body: bytes) -> bytes:
        return fcc + struct.pack(">I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b""
        )

    body = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + struct.pack(">I", len(body)) + body


# --- WAV (our own RIFF walk — beyond the stdlib's subset) -----------------------

_KSDATAFORMAT_PCM = b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
_KSDATAFORMAT_FLOAT = b"\x03\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def decode_wav(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode WAV with our own RIFF walk → (samples (n, ch), rate,
    source bits). Formats: PCM (unsigned 8 / signed LE 16/24/32),
    IEEE float32 (returned as float64 in [-1, 1]), G.711 A-law (6)
    and µ-law (7), and WAVE_FORMAT_EXTENSIBLE resolved through its
    SubFormat GUID. The stdlib ``wave`` module reads none of the
    companded/float forms — this decoder is also what lets the
    feature extractor accept the full CPython pluck corpus."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    size = struct.unpack("<I", payload[4:8])[0]
    end = min(len(payload), 8 + size)

    fmt = None
    data = None
    pos = 12
    while pos + 8 <= end:
        ctype = payload[pos : pos + 4]
        clen = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + clen]
        if len(body) != clen:
            raise ValueError(f"truncated {ctype!r} chunk")
        if ctype == b"fmt ":
            fmt = body
        elif ctype == b"data":
            data = body
        pos += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")

    tag, n_ch, rate, _bps, _align, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE
        if len(fmt) < 40:
            raise ValueError("extensible fmt chunk too short")
        guid = fmt[24:40]
        if guid == _KSDATAFORMAT_PCM:
            tag = 1
        elif guid == _KSDATAFORMAT_FLOAT:
            tag = 3
        else:
            raise NotImplementedError(f"extensible SubFormat {guid.hex()}")
    if n_ch < 1:
        raise ValueError("WAV channel count must be >= 1")

    if tag == 1:
        if bits == 8:  # WAV 8-bit PCM is UNSIGNED with a 128 offset
            flat = np.frombuffer(data, dtype=np.uint8).astype(np.int32) - 128
            return flat.reshape(-1, n_ch), rate, 8
        if bits in (16, 24, 32):
            return _unpack_pcm(data, bits, n_ch, big_endian=False), rate, bits
        raise NotImplementedError(f"WAV PCM bit depth {bits}")
    if tag == 3:
        if bits != 32:
            raise NotImplementedError(f"WAV float bit depth {bits}")
        flat = np.frombuffer(data, dtype="<f4").astype(np.float64)
        return flat.reshape(-1, n_ch), rate, 32
    if tag == 6:
        flat = alaw_to_linear(np.frombuffer(data, dtype=np.uint8))
        return flat.reshape(-1, n_ch), rate, 16
    if tag == 7:
        flat = ulaw_to_linear(np.frombuffer(data, dtype=np.uint8))
        return flat.reshape(-1, n_ch), rate, 16
    raise NotImplementedError(f"WAV format tag {tag}")
