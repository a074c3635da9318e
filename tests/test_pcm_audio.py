"""AU / AIFF / WAV container + G.711 pins (functions/pcm_audio —
r11, the audio-interop tier).

Independence strategy: this tier has what FLAC lacks — REAL files
from independent encoders, shipped in the container (CPython's
pluck corpus: the same recording across AU/AIFF/WAV at four PCM
depths plus µ-law and A-law). Pins: stdlib ``wave`` as the exact
16-bit WAV reference, exact cross-container sample identity at
24/32 bits, bounded generator-dither at 8/16 bits, the published
G.711 endpoint constants, and quantization-step bounds for the
companded files against the same recording's PCM content.
"""

from __future__ import annotations

import io
import os
import struct
import wave

import numpy as np
import pytest

from data_warehouse_migration_spark.functions.pcm_audio import (
    alaw_to_linear,
    decode_aiff,
    decode_au,
    decode_wav,
    encode_aiff,
    encode_au,
    linear_to_alaw,
    linear_to_ulaw,
    ulaw_to_linear,
)

_BASE = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/audiodata/"
)
_HAVE_CORPUS = os.path.isdir(_BASE)
needs_corpus = pytest.mark.skipif(
    not _HAVE_CORPUS, reason="CPython pluck corpus not present"
)


def _rd(name: str) -> bytes:
    with open(_BASE + name, "rb") as f:
        return f.read()


# --- round-trips through our own encoders --------------------------------------


@pytest.mark.parametrize("encoding", ["pcm8", "pcm16", "pcm24", "pcm32"])
def test_au_roundtrip(encoding):
    bits = int(encoding[3:])
    rng = np.random.default_rng(1)
    s = rng.integers(-(1 << (bits - 1)), 1 << (bits - 1), size=(300, 2))
    dec, rate, b = decode_au(encode_au(s, 22050, encoding))
    assert (rate, b) == (22050, bits)
    assert (dec == s).all()


@pytest.mark.parametrize("bits", [8, 16, 24, 32])
def test_aiff_roundtrip(bits):
    rng = np.random.default_rng(2)
    s = rng.integers(-(1 << (bits - 1)), 1 << (bits - 1), size=(257, 1))
    dec, rate, b = decode_aiff(encode_aiff(s, 44100, bits))
    assert (rate, b) == (44100, bits)
    assert (dec == s).all()


def test_au_companded_roundtrip_is_value_fixpoint():
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, size=400)
    for enc, table in (("ulaw", ulaw_to_linear), ("alaw", alaw_to_linear)):
        dec1, _, _ = decode_au(encode_au(s, 8000, enc))
        dec2, _, _ = decode_au(encode_au(dec1[:, 0], 8000, enc))
        assert (dec1 == dec2).all(), enc  # companding is a projection


# --- G.711 published constants and structure -----------------------------------


def test_ulaw_published_endpoints():
    assert ulaw_to_linear(np.array([0x00]))[0] == -32124
    assert ulaw_to_linear(np.array([0x80]))[0] == 32124
    assert ulaw_to_linear(np.array([0x7F]))[0] == 0
    assert ulaw_to_linear(np.array([0xFF]))[0] == 0
    # monotone within each sign half
    neg = ulaw_to_linear(np.arange(0, 128, dtype=np.uint8))
    pos = ulaw_to_linear(np.arange(128, 256, dtype=np.uint8))
    assert (np.diff(neg) > 0).all() and (np.diff(pos) < 0).all()


def test_alaw_published_endpoints():
    # A-law: 0x2A (0x7F^0x55) is the largest negative, 0xAA the
    # largest positive; ±8 are the two smallest magnitudes
    vals = alaw_to_linear(np.arange(256, dtype=np.uint8))
    assert vals.max() == 32256 and vals.min() == -32256
    assert set(np.abs(vals)[np.abs(vals).argsort()[:2]]) == {8}


def test_companding_code_fixpoints():
    codes = np.arange(256, dtype=np.uint8)
    # A-law: every code is reproduced by encode(decode(code))
    assert (linear_to_alaw(alaw_to_linear(codes)) == codes).all()
    # µ-law: same, except 0x7F (−0) — both zeros decode to 0 and 0
    # re-encodes to +0 (0xFF), the published two-zeros property
    back = linear_to_ulaw(ulaw_to_linear(codes))
    assert back[0x7F] == 0xFF
    mask = codes != 0x7F
    assert (back[mask] == codes[mask]).all()


# --- real-file pins -------------------------------------------------------------


@needs_corpus
def test_wav16_matches_stdlib_wave_exactly():
    data = _rd("pluck-pcm16.wav")
    w = wave.open(io.BytesIO(data))
    ref = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2").reshape(
        -1, w.getnchannels()
    )
    dec, rate, bits = decode_wav(data)
    assert rate == w.getframerate() and bits == 16
    assert np.array_equal(dec, ref)


@needs_corpus
@pytest.mark.parametrize("bits", [24, 32])
def test_cross_container_identity_at_high_depths(bits):
    """The same recording in AU, AIFF, and WAV — three containers,
    three byte orders/offsets, independent encoders — must decode to
    IDENTICAL samples at 24/32 bits (no depth conversion happened)."""
    au, r1, _ = decode_au(_rd(f"pluck-pcm{bits}.au"))
    af, r2, _ = decode_aiff(_rd(f"pluck-pcm{bits}.aiff"))
    wv, r3, _ = decode_wav(_rd(f"pluck-pcm{bits}.wav"))
    assert r1 == r2 == r3 == 11025
    assert au.shape == af.shape == wv.shape == (3307, 2)
    assert np.array_equal(au, af) and np.array_equal(au, wv)


@needs_corpus
@pytest.mark.parametrize("bits,bound", [(8, 1), (16, 16)])
def test_cross_container_dither_bound_at_low_depths(bits, bound):
    """At 8/16 bits the corpus files carry independent depth-reduction
    dither (they differ from each other by design); the pin is a tight
    amplitude bound, not identity."""
    au, _, _ = decode_au(_rd(f"pluck-pcm{bits}.au"))
    af, _, _ = decode_aiff(_rd(f"pluck-pcm{bits}.aiff"))
    wv, _, _ = decode_wav(_rd(f"pluck-pcm{bits}.wav"))
    assert int(np.abs(au - af).max()) <= bound
    assert int(np.abs(au - wv).max()) <= bound


@needs_corpus
def test_real_companded_files_within_one_quantization_step():
    pcm16, _, _ = decode_au(_rd("pluck-pcm16.au"))
    ud, ur, ub = decode_au(_rd("pluck-ulaw.au"))
    assert (ur, ub) == (11025, 16) and ud.shape == pcm16.shape
    # µ-law's largest segment step is 8·2^7 = 1024, and within a
    # segment the step scales with amplitude (~value/16): every
    # sample must sit within one amplitude-relative step
    err = np.abs(ud.astype(np.int64) - pcm16.astype(np.int64))
    assert int(err.max()) <= 1024
    assert (err <= np.abs(pcm16.astype(np.int64)) // 8 + 64).all()

    ad, ar, ab = decode_aiff(_rd("pluck-alaw.aifc"))
    assert (ar, ab) == (11025, 16) and ad.shape == pcm16.shape
    assert int(np.abs(ad - pcm16).max()) <= 1024
    # our encode of the decoded values reproduces the file's codes
    # (the value fixpoint, on real audio)
    redec, _, _ = decode_au(encode_au(ud, 11025, "ulaw"))
    assert np.array_equal(redec, ud)


@needs_corpus
def test_classic_audiotest_au_is_ulaw_mono():
    dec, rate, bits = decode_au(
        open(_BASE + "../audiotest.au", "rb").read()
    )
    assert (rate, bits) == (8012, 16)
    assert dec.shape == (28110, 1)
    assert int(np.abs(dec).max()) > 10000  # real audio, real amplitude


@needs_corpus
def test_real_aiff_aifc_header_fields():
    data = _rd("pluck-pcm16.aiff")
    assert data[:4] == b"FORM" and data[8:12] == b"AIFF"
    dec, rate, bits = decode_aiff(data)
    assert (rate, bits) == (11025, 16) and dec.shape == (3307, 2)
    datac = _rd("pluck-ulaw.aifc")
    assert datac[8:12] == b"AIFC"
    decc, ratec, bitsc = decode_aiff(datac)
    assert (ratec, bitsc) == (11025, 16) and decc.shape == (3307, 2)


# --- WAV format-tag coverage beyond the stdlib ----------------------------------


def _wav(fmt_tag: int, n_ch: int, rate: int, bits: int, data: bytes,
         fmt_extra: bytes = b"") -> bytes:
    fmt = struct.pack(
        "<HHIIHH", fmt_tag, n_ch, rate, rate * n_ch * bits // 8,
        n_ch * bits // 8, bits,
    ) + fmt_extra

    def chunk(fcc, body):
        return fcc + struct.pack("<I", len(body)) + body + (
            b"\x00" if len(body) % 2 else b"")

    body = b"WAVE" + chunk(b"fmt ", fmt) + chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_mulaw_alaw_and_float_formats():
    codes = bytes(range(0, 200, 7))
    dec, rate, bits = decode_wav(_wav(7, 1, 8000, 8, codes))
    assert np.array_equal(dec[:, 0], ulaw_to_linear(np.frombuffer(codes, np.uint8)))
    dec_a, _, _ = decode_wav(_wav(6, 1, 8000, 8, codes))
    assert np.array_equal(dec_a[:, 0], alaw_to_linear(np.frombuffer(codes, np.uint8)))
    f = np.array([-1.0, -0.5, 0.0, 0.25, 1.0], dtype="<f4")
    dec_f, _, bits_f = decode_wav(_wav(3, 1, 48000, 32, f.tobytes()))
    assert bits_f == 32 and np.allclose(dec_f[:, 0], f.astype(np.float64))


def test_wav_unsigned8_offset_and_extensible():
    raw = bytes([0, 128, 255, 1])
    dec, _, _ = decode_wav(_wav(1, 1, 8000, 8, raw))
    assert dec[:, 0].tolist() == [-128, 0, 127, -127]
    guid = b"\x01\x00\x00\x00\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"
    extra = struct.pack("<HHI", 22, 16, 1) + guid
    s = np.array([-300, 0, 500], dtype="<i2")
    dec2, _, _ = decode_wav(_wav(0xFFFE, 1, 8000, 16, s.tobytes(), extra))
    assert dec2[:, 0].tolist() == [-300, 0, 500]


def test_container_error_paths():
    with pytest.raises(ValueError, match="not an AU"):
        decode_au(b"RIFF" + bytes(20))
    with pytest.raises(ValueError, match="not an IFF"):
        decode_aiff(b".snd" + bytes(20))
    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        decode_wav(b"FORM" + bytes(20))
    with pytest.raises(NotImplementedError, match="format tag"):
        decode_wav(_wav(2, 1, 8000, 4, b"\x00\x00"))  # ADPCM
    good = encode_au(np.zeros(8, dtype=np.int64), 8000, "pcm16")
    with pytest.raises(NotImplementedError, match="AU encoding 99"):
        decode_au(good[:12] + struct.pack(">I", 99) + good[16:])
