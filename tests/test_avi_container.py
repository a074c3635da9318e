"""AVI/MJPEG container pins (functions/avi.py — r11, the video rung).

Independence strategy: the round-trip tests exercise
encoder+parser together, so the independent pins are (a) a
HAND-ASSEMBLED container built with raw ``struct`` packing in this
file (never touching the encoder) that the parser must read, (b)
byte-level assertions on the encoder's output against the public
RIFF/AVI layout directly, and (c) malformation tests — frame-count
lies, index drift, truncation — that the parser must catch rather
than silently mis-sample.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_warehouse_migration_spark.functions.avi import (
    encode_avi_mjpeg,
    parse_avi,
    sample_frames,
)
from data_warehouse_migration_spark.functions.jpeg import (
    decode_jpeg,
    encode_jpeg_gray,
)


def _tile_frame(seed: int) -> np.ndarray:
    img = np.zeros((16, 16), dtype=np.uint8)
    for i in range(2):
        for j in range(2):
            img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = (
                2 * ((seed * 17 + i * 5 + j * 3) % 128)
            )
    return img


def _mjpeg_avi(n_frames: int, fps: int = 10) -> tuple[bytes, list[np.ndarray]]:
    imgs = [_tile_frame(f) for f in range(n_frames)]
    return (
        encode_avi_mjpeg([encode_jpeg_gray(i) for i in imgs], 16, 16, fps),
        imgs,
    )


def test_roundtrip_metadata_and_frame_bytes():
    payload, imgs = _mjpeg_avi(7, fps=25)
    meta = parse_avi(payload)
    assert (meta["width"], meta["height"]) == (16, 16)
    assert meta["fps"] == 25
    assert meta["n_frames"] == 7
    assert meta["handler"] == b"MJPG"
    for frame, img in zip(meta["frames"], imgs):
        assert (decode_jpeg(frame) == img).all()


def test_frame_sampling_strides():
    payload, imgs = _mjpeg_avi(8)
    for every_n, expect in ((1, 8), (2, 4), (3, 3), (8, 1), (100, 1)):
        meta, sampled = sample_frames(payload, every_n=every_n)
        assert len(sampled) == expect
        assert (decode_jpeg(sampled[0]) == imgs[0]).all()
    _, s3 = sample_frames(payload, every_n=3)
    assert (decode_jpeg(s3[1]) == imgs[3]).all()
    with pytest.raises(ValueError):
        sample_frames(payload, every_n=0)


def test_container_layout_pinned_against_riff_spec():
    payload, _ = _mjpeg_avi(3, fps=10)
    assert payload[:4] == b"RIFF"
    assert struct.unpack_from("<I", payload, 4)[0] == len(payload) - 8
    assert payload[8:12] == b"AVI "
    # first child: LIST hdrl, whose first child is avih sized 56
    assert payload[12:16] == b"LIST" and payload[20:24] == b"hdrl"
    assert payload[24:28] == b"avih"
    assert struct.unpack_from("<I", payload, 28)[0] == 56
    avih = payload[32:88]
    us_per_frame, _, _, flags, total = struct.unpack_from("<5I", avih, 0)
    assert us_per_frame == 100_000 and total == 3
    assert flags & 0x10  # AVIF_HASINDEX
    w, h = struct.unpack_from("<II", avih, 32)
    assert (w, h) == (16, 16)
    # strf's BITMAPINFOHEADER declares MJPG compression
    strf_at = payload.index(b"strf")
    bih = payload[strf_at + 8 : strf_at + 48]
    assert struct.unpack_from("<I", bih, 0)[0] == 40
    assert bih[16:20] == b"MJPG"


def test_hand_assembled_container_parses():
    """A minimal AVI packed from raw structs (no encoder): one vids
    stream, two 00dc frames with dummy payloads, no idx1."""
    f1, f2 = b"\xde\xad\xbe\xef", b"\x01\x02\x03"  # odd size → pad byte

    def chunk(fcc, data):
        return fcc + struct.pack("<I", len(data)) + data + (b"\x00" if len(data) % 2 else b"")

    avih = struct.pack("<14I", 40000, 0, 0, 0, 2, 0, 1, 0, 32, 24, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, 25, 0, 2, 0, 0, 0, 0, 0, 32, 24,
    )
    strf = struct.pack("<IiiHH4sIiiII", 40, 32, 24, 1, 24, b"MJPG", 0, 0, 0, 0, 0)
    hdrl = chunk(b"LIST", b"hdrl" + chunk(b"avih", avih)
                 + chunk(b"LIST", b"strl" + chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = chunk(b"LIST", b"movi" + chunk(b"00dc", f1) + chunk(b"00dc", f2))
    body = b"AVI " + hdrl + movi
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    meta = parse_avi(payload)
    assert (meta["width"], meta["height"]) == (32, 24)
    assert meta["fps"] == 25
    assert meta["frames"] == [f1, f2]


def test_detects_frame_count_lie():
    payload, _ = _mjpeg_avi(4)
    # avih dwTotalFrames sits 16 bytes into the avih body at offset 32
    bad = bytearray(payload)
    assert bad[24:28] == b"avih"
    struct.pack_into("<I", bad, 32 + 16, 9)
    with pytest.raises(ValueError, match="declares 9 frames"):
        parse_avi(bytes(bad))


def test_detects_index_drift():
    payload, _ = _mjpeg_avi(3)
    bad = bytearray(payload)
    at = bad.index(b"idx1")
    # corrupt the second entry's offset field
    struct.pack_into("<I", bad, at + 8 + 16 + 8, 12345)
    with pytest.raises(ValueError, match="idx1 entry 1"):
        parse_avi(bytes(bad))


def test_rejects_truncation_and_non_avi():
    payload, _ = _mjpeg_avi(2)
    with pytest.raises(ValueError):
        parse_avi(payload[: len(payload) // 2])
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi(b"fLaC" + payload[4:])
    with pytest.raises(ValueError, match="not a RIFF/AVI"):
        parse_avi(b"RIFF\x04\x00\x00\x00WAVE")


def test_non_mjpeg_handler_raises_in_sampler():
    payload, _ = _mjpeg_avi(2)
    bad = bytearray(payload)
    at = bad.index(b"strh")
    bad[at + 12 : at + 16] = b"H264"
    with pytest.raises(NotImplementedError, match="MJPEG"):
        sample_frames(bytes(bad))


def test_decode_real_asset_video_branch():
    from data_warehouse_migration_spark.operators.multimodal import (
        _decode_real_asset,
    )

    payload, imgs = _mjpeg_avi(5)
    w, h, norm = _decode_real_asset("video/avi", payload)
    assert (w, h) == (16, 16)
    assert norm == pytest.approx(float(imgs[0].mean()) / 255.0)


def test_decode_real_asset_flac_branch():
    from data_warehouse_migration_spark.functions.flac import encode_flac
    from data_warehouse_migration_spark.operators.multimodal import (
        _decode_real_asset,
    )

    sig = ((np.arange(200) * 37) % 1024 - 512).astype(np.int64)
    payload = encode_flac(sig[:, None], 22050, 16, strategy="fixed")
    rate, n_ch, rms = _decode_real_asset("audio/flac", payload)
    assert (rate, n_ch) == (22050, 1)
    assert rms == pytest.approx(
        float(np.sqrt((sig.astype("float64") ** 2).mean())) / 32768.0
    )
