"""functions/jpeg — baseline grayscale JPEG codec, tested without any
third-party codec: (1) a HAND-DERIVED entropy bitstream for the
trivial block (the encoder's bits are checked against T.81 arithmetic
done on paper, not against the decoder); (2) decode(encode(x)) must
equal an INDEPENDENT quantized-reconstruction reference computed with
a test-local DCT — both sides share no bitstream code, so Huffman/
marker/zigzag/DC-prediction bugs cannot cancel; (3) exact round-trips
for the DC-only even-value family the registry oracle's closed form
relies on; (4) honest-absence guards."""

from __future__ import annotations

import numpy as np
import pytest

from data_warehouse_migration_spark.functions.jpeg import (
    QUANT_LUMA,
    decode_jpeg_gray,
    encode_jpeg_gray,
    zigzag_order,
)


def _entropy_segment(data: bytes) -> bytes:
    i = data.index(b"\xff\xda")
    seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
    return data[i + 2 + seg_len : data.rfind(b"\xff\xd9")]


def _reference_reconstruction(img: np.ndarray) -> np.ndarray:
    """Quantize+reconstruct with a TEST-LOCAL DCT (no imports from the
    codec beyond the public quantization table)."""
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)
    h, w = img.shape
    out = np.zeros((h, w))
    for by in range(0, h, 8):
        for bx in range(0, w, 8):
            blk = img[by : by + 8, bx : bx + 8].astype(np.int32) - 128
            q = np.round((m @ blk @ m.T) / QUANT_LUMA)
            out[by : by + 8, bx : bx + 8] = m.T @ (q * QUANT_LUMA) @ m
    return np.clip(np.round(out + 128), 0, 255).astype(np.uint8)


def test_solid_block_entropy_bits_hand_derived():
    """Solid 128: level shift → all-zero block → DC category 0 + EOB.
    With the declared uniform-length tables, DC cat 0 is the 4-bit
    canonical code 0000 and EOB is HUFFVAL[0] → the 8-bit code
    00000000; 12 bits padded with 1s gives exactly 00 0F."""
    data = encode_jpeg_gray(np.full((8, 8), 128, dtype=np.uint8))
    assert _entropy_segment(data) == b"\x00\x0f"


def test_even_tile_roundtrip_is_bit_exact():
    img = np.zeros((16, 16), dtype=np.uint8)
    for k, v in enumerate([40, 200, 128, 2]):
        i, j = divmod(k, 2)
        img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = v
    assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(img)), img)


def test_random_images_match_independent_reference():
    rng = np.random.default_rng(42)
    for shape in [(8, 8), (16, 24), (40, 8)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        got = decode_jpeg_gray(encode_jpeg_gray(img))
        assert np.array_equal(got, _reference_reconstruction(img)), shape


def test_dc_prediction_chain_many_blocks():
    """A long strip of solid even-valued blocks with rising and
    falling values exercises positive AND negative DC diffs across
    a 16-block prediction chain — exact by the DC-only argument."""
    vals = [0, 254, 2, 200, 100, 100, 0, 64, 128, 130, 126, 4, 250, 6, 8, 244]
    img = np.zeros((8, 8 * len(vals)), dtype=np.uint8)
    for k, v in enumerate(vals):
        img[:, k * 8 : (k + 1) * 8] = v
    assert np.array_equal(decode_jpeg_gray(encode_jpeg_gray(img)), img)


def test_non_multiple_of_8_dimensions_crop():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (13, 22), dtype=np.uint8)
    got = decode_jpeg_gray(encode_jpeg_gray(img))
    assert got.shape == (13, 22)
    assert np.array_equal(got, _reference_reconstruction(
        np.pad(img, ((0, 3), (0, 2)), mode="edge")
    )[:13, :22])


def test_zigzag_is_a_permutation_with_known_anchors():
    zz = zigzag_order()
    assert len(set(zz)) == 64
    assert zz[0] == (0, 0) and zz[1] == (0, 1) and zz[2] == (1, 0)
    assert zz[63] == (7, 7)


def test_unsupported_shapes_raise():
    data = bytearray(encode_jpeg_gray(np.full((8, 8), 128, dtype=np.uint8)))
    sof = bytes(data).index(b"\xff\xc0")
    prog = data.copy()
    prog[sof + 1] = 0xC2  # rewrite SOF0 → SOF2
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_gray(bytes(prog))
    sub = data.copy()
    # FF C0 | len(2) | prec | h(2) | w(2) | ncomp | cid | sampling
    sub[sof + 11] = 0x33  # sampling factors 3x3: beyond baseline-common
    with pytest.raises(NotImplementedError, match="sampling factors"):
        decode_jpeg_gray(bytes(sub))
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_gray(b"\x00\x01\x02")


def test_grayscale_with_nonunit_sampling_factors_decodes():
    """T.81 A.2: a single-component scan is non-interleaved — its
    declared sampling factors play no role (some real encoders write
    2x2 factors on grayscale), so the stream must decode normally."""
    img = np.full((8, 8), 64, dtype=np.uint8)
    data = bytearray(encode_jpeg_gray(img))
    sof = bytes(data).index(b"\xff\xc0")
    data[sof + 11] = 0x22
    assert np.array_equal(decode_jpeg_gray(bytes(data)), img)


def test_gray_wrapper_rejects_color_stream():
    from data_warehouse_migration_spark.functions.jpeg import (
        encode_jpeg_color,
    )

    rgb = np.full((8, 8, 3), 128, dtype=np.uint8)
    with pytest.raises(ValueError, match="decode_jpeg"):
        decode_jpeg_gray(encode_jpeg_color(rgb))


def test_color_gray_content_roundtrip_is_bit_exact():
    """Gray pixels map to Y=v, Cb=Cr=128 EXACTLY (coefficients sum to
    1 / 0), and even tile values keep every component block DC-only
    and quantization-exact — so the full 3-component pipeline
    (interleaved MCUs, chroma tables, three DC prediction chains,
    both color transforms) must reproduce the input bit-for-bit."""
    from data_warehouse_migration_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rgb = np.zeros((16, 16, 3), dtype=np.uint8)
    for k, v in enumerate([40, 200, 128, 2]):
        i, j = divmod(k, 2)
        rgb[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8, :] = v
    assert np.array_equal(decode_jpeg(encode_jpeg_color(rgb)), rgb)


def test_color_random_matches_independent_reference():
    """True color content: decode(encode(rgb)) must equal a test-local
    YCbCr → per-channel quantized reconstruction → RGB pipeline that
    shares no bitstream code with the codec."""
    from data_warehouse_migration_spark.functions.jpeg import (
        QUANT_CHROMA,
        decode_jpeg,
        encode_jpeg_color,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)
    rng = np.random.default_rng(11)
    rgb = rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
    ycc = rgb_to_ycbcr(rgb).astype(np.int32)
    qs = [QUANT_LUMA, QUANT_CHROMA, QUANT_CHROMA]
    ref = np.zeros(ycc.shape, np.float64)
    for c in range(3):
        for by in range(0, 16, 8):
            for bx in range(0, 24, 8):
                blk = ycc[by : by + 8, bx : bx + 8, c] - 128
                q = np.round((m @ blk @ m.T) / qs[c])
                ref[by : by + 8, bx : bx + 8, c] = m.T @ (q * qs[c]) @ m
    ref_rgb = ycbcr_to_rgb(
        np.clip(np.round(ref + 128), 0, 255).astype(np.uint8)
    )
    assert np.array_equal(decode_jpeg(encode_jpeg_color(rgb)), ref_rgb)


def test_decode_real_asset_jpeg_branch():
    from data_warehouse_migration_spark.operators.multimodal import (
        _decode_real_asset,
    )

    img = np.full((16, 8), 64, dtype=np.uint8)  # even value → exact
    w, h, norm = _decode_real_asset("image/jpeg", encode_jpeg_gray(img))
    assert (w, h) == (8, 16)
    assert norm == pytest.approx(64 / 255.0)


def test_ff_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF
    fill bytes — a compliant foreign encoder's padding must decode."""
    img = np.full((8, 8), 64, dtype=np.uint8)
    data = encode_jpeg_gray(img)
    i = data.index(b"\xff\xdb")  # pad before DQT
    padded = data[:i] + b"\xff\xff\xff" + data[i:]
    assert np.array_equal(decode_jpeg_gray(padded), img)


def test_420_gray_content_multi_mcu_roundtrip_is_bit_exact():
    """32×32 (four MCUs) gray-content 4:2:0: constant-128 chroma box-
    averages exactly and every even Y tile is DC-only — the MCU block
    traversal, the shared 4-Y DC chain, the subsampled geometry, and
    the replication upsampler must all reproduce the input."""
    from data_warehouse_migration_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng_vals = [(2 * ((13 * i + 7 * j) % 128)) for i in range(4) for j in range(4)]
    rgb = np.zeros((32, 32, 3), dtype=np.uint8)
    for k, v in enumerate(rng_vals):
        i, j = divmod(k, 4)
        rgb[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8, :] = v
    assert np.array_equal(
        decode_jpeg(encode_jpeg_color(rgb, subsample="420")), rgb
    )


def test_420_random_matches_independent_reference():
    """True-color 4:2:0: decode(encode(rgb)) must equal a test-local
    pipeline — YCbCr, 2×2 box-averaged chroma, per-plane quantized
    reconstruction, replication upsample — sharing no bitstream code
    with the codec."""
    from data_warehouse_migration_spark.functions.jpeg import (
        QUANT_CHROMA,
        decode_jpeg,
        encode_jpeg_color,
        rgb_to_ycbcr,
        ycbcr_to_rgb,
    )

    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) / 2.0
    m[0, :] /= np.sqrt(2.0)

    def recon(plane, quant):
        out = np.zeros(plane.shape, np.float64)
        for by in range(0, plane.shape[0], 8):
            for bx in range(0, plane.shape[1], 8):
                blk = plane[by : by + 8, bx : bx + 8].astype(np.int32) - 128
                q = np.round((m @ blk @ m.T) / quant)
                out[by : by + 8, bx : bx + 8] = m.T @ (q * quant) @ m
        return out

    rng = np.random.default_rng(19)
    rgb = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    ycc = rgb_to_ycbcr(rgb).astype(np.int32)
    y_rec = recon(ycc[:, :, 0], QUANT_LUMA)
    planes = [y_rec]
    for c in (1, 2):
        sub = np.round(
            ycc[:, :, c].reshape(16, 2, 24, 2).mean(axis=(1, 3))
        ).astype(np.int32)
        planes.append(np.repeat(np.repeat(recon(sub, QUANT_CHROMA), 2, 0), 2, 1))
    ref = ycbcr_to_rgb(
        np.clip(np.round(np.stack(planes, axis=-1) + 128), 0, 255).astype(
            np.uint8
        )
    )
    got = decode_jpeg(encode_jpeg_color(rgb, subsample="420"))
    assert np.array_equal(got, ref)


def test_restart_intervals_roundtrip_all_modes():
    """DRI/RSTn (T.81 E.1.4/E.2.4): restart-interval streams must
    decode identically to their no-restart twins — padding to the
    byte boundary, the cycling RSTn markers, and the DC predictor
    resets all exercised, including a boundary landing exactly on
    the final MCU."""
    from data_warehouse_migration_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
    )

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (20, 45), dtype=np.uint8)
    base = decode_jpeg_gray(encode_jpeg_gray(img))
    for ri in (1, 2, 3, 7):
        data = encode_jpeg_gray(img, restart_interval=ri)
        assert np.array_equal(decode_jpeg_gray(data), base), ri
    assert b"\xff\xd0" in encode_jpeg_gray(img, restart_interval=1)

    rgb = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    for sub in ("444", "420"):
        base_c = decode_jpeg(encode_jpeg_color(rgb, sub))
        for ri in (1, 2, 5):
            got = decode_jpeg(
                encode_jpeg_color(rgb, sub, restart_interval=ri)
            )
            assert np.array_equal(got, base_c), (sub, ri)

    # boundary exactly on the last MCU: no trailing RST emitted
    img2 = np.full((8, 16), 64, dtype=np.uint8)
    for ri in (1, 2):
        assert np.array_equal(
            decode_jpeg_gray(encode_jpeg_gray(img2, restart_interval=ri)),
            img2,
        )


def test_restart_marker_sequence_cycles_mod_8():
    """A 10-MCU strip at interval 1 emits RST0..RST7 then RST0 again
    — the n-mod-8 cycle a real decoder resynchronizes on."""
    img = np.full((8, 80), 64, dtype=np.uint8)  # 10 MCUs
    data = encode_jpeg_gray(img, restart_interval=1)
    i = data.index(b"\xff\xda")
    seg_len = int.from_bytes(data[i + 2 : i + 4], "big")
    entropy = data[i + 2 + seg_len : data.rfind(b"\xff\xd9")]
    rsts = [
        entropy[k + 1] - 0xD0
        for k in range(len(entropy) - 1)
        if entropy[k] == 0xFF and 0xD0 <= entropy[k + 1] <= 0xD7
    ]
    assert rsts == [0, 1, 2, 3, 4, 5, 6, 7, 0]


# --- progressive (SOF2) — r11 ----------------------------------------------


def _prog_imports():
    from data_warehouse_migration_spark.functions.jpeg import (
        decode_jpeg,
        decode_jpeg_auto,
        decode_jpeg_progressive,
        encode_jpeg_progressive_gray,
        is_progressive_jpeg,
    )

    return (
        decode_jpeg,
        decode_jpeg_auto,
        decode_jpeg_progressive,
        encode_jpeg_progressive_gray,
        is_progressive_jpeg,
    )


def test_progressive_exact_submanifold_roundtrip():
    """Even solid tiles: DC-only blocks quantize exactly and
    successive approximation is exact for them — the gate's closed
    form."""
    _, _, dec, enc, is_prog = _prog_imports()
    img = np.zeros((16, 16), np.uint8)
    for i in range(2):
        for j in range(2):
            img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = 2 * (
                (17 + i * 11 + j * 7) % 128
            )
    payload = enc(img)
    assert is_prog(payload)
    assert np.array_equal(dec(payload), img)


def test_progressive_equals_baseline_on_identical_coefficients():
    """Both pipelines quantize with the same tables, so the decoded
    pixels must be IDENTICAL — progressive is a different entropy
    coding of the same coefficients, and any divergence is a bug in
    one of the four scan codecs or the scan-script sequencing."""
    base_dec, auto, _, enc, _ = _prog_imports()
    rng = np.random.default_rng(11)
    for _ in range(6):
        h, w = rng.integers(5, 48, 2)
        img = rng.integers(0, 256, (h, w), np.uint8)
        assert np.array_equal(
            base_dec(encode_jpeg_gray(img)), auto(enc(img))
        ), (h, w)
    for img in (
        np.full((24, 40), 128, np.uint8),  # everything rides EOB runs
        np.tile(np.arange(40, dtype=np.uint8) * 6, (24, 1)),
        np.tile(np.array([0, 255] * 20, np.uint8), (24, 1)),
    ):
        assert np.array_equal(base_dec(encode_jpeg_gray(img)), auto(enc(img)))


def test_progressive_single_scan_script_equals_default():
    """Scan-script independence: a minimal script (no approximation,
    one AC band) must decode to the same pixels as the six-scan
    default — the coefficient content is script-invariant."""
    _, _, dec, enc, _ = _prog_imports()
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (19, 21), np.uint8)
    minimal = ((0, 0, 0, 0), (1, 63, 0, 0))
    assert np.array_equal(dec(enc(img)), dec(enc(img, script=minimal)))


#: Real progressive files from INDEPENDENT encoders shipped in this
#: container, covering every supported sampling layout. Means are
#: regression pins from the first verified decode (the white-stripe
#: images additionally assert near-white content — ground truth from
#: their documented role as nodejs doc assets).
_REAL_PROGRESSIVE = [
    (
        "/opt/spark-4.1.2-bin-hadoop3/data/mllib/images/origin/"
        "multi-channel/grayscale.jpg",
        (215, 300),
        142.14,
    ),
    ("/usr/share/doc/nodejs/thin-white-stripe.jpg", (58, 493, 3), 233.38),
    ("/usr/share/doc/nodejs/full-white-stripe.jpg", (312, 493, 3), 249.81),
    (
        "/root/.rustup/toolchains/stable-x86_64-unknown-linux-gnu/share/"
        "doc/rust/html/embedded-book/assets/f3.jpg",
        (477, 720, 3),
        107.87,
    ),
]


def test_real_world_progressive_files_decode():
    import os

    _, _, dec, _, is_prog = _prog_imports()
    seen = 0
    for path, shape, mean in _REAL_PROGRESSIVE:
        if not os.path.exists(path):
            continue  # container layout drift: pin what exists
        data = open(path, "rb").read()
        assert is_prog(data), path
        img = dec(data)
        assert img.shape == shape, path
        assert abs(float(img.mean()) - mean) < 0.5, (path, float(img.mean()))
        seen += 1
    assert seen >= 2, "too few real progressive files found to pin"
    # the white-stripe assets are known near-white content
    ws = "/usr/share/doc/nodejs/full-white-stripe.jpg"
    if os.path.exists(ws):
        img = dec(open(ws, "rb").read())
        assert (img > 230).mean() > 0.9


def test_real_world_progressive_420_large():
    """The 4:2:0 2241×2013 pyparsing class diagram — the largest and
    the only 2x2-sampled real progressive file in the container."""
    import os

    _, _, dec, _, _ = _prog_imports()
    path = (
        "/usr/lib/google-cloud-sdk/platform/gsutil/third_party/"
        "pyparsing/docs/_static/pyparsingClassDiagram_3.0.9.jpg"
    )
    if not os.path.exists(path):
        pytest.skip("asset not in this container")
    img = dec(open(path, "rb").read())
    assert img.shape == (2241, 2013, 3)
    assert abs(float(img.mean()) - 247.39) < 0.5


def test_progressive_auto_dispatch_keeps_baseline_untouched():
    """decode_jpeg_auto routes SOF2 to the progressive decoder and
    everything else to the UNCHANGED baseline path; decode_jpeg still
    raises on SOF2 (its attested behavior)."""
    _, auto, _, enc, _ = _prog_imports()
    img = np.full((8, 8), 120, np.uint8)
    assert np.array_equal(auto(encode_jpeg_gray(img)), img)
    with pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg_gray(enc(img))


def test_ac_scan_codecs_fuzz_roundtrip():
    """Direct encode→decode fuzz of the AC first/refine scan pair over
    random sparse coefficient blocks — the correction-bit and EOB-run
    state machines, without DCT/pixels in the loop."""
    import data_warehouse_migration_spark.functions.jpeg as J

    rng = np.random.default_rng(5)
    for _ in range(150):
        nbx = int(rng.integers(1, 5))
        blocks = np.zeros((1, nbx, 64), np.int64)
        for b in range(nbx):
            for _k in range(int(rng.integers(0, 8))):
                blocks[0, b, int(rng.integers(1, 64))] = int(
                    rng.integers(-40, 41)
                )
        order = [(0, bx) for bx in range(nbx)]
        scans = [(1, 5, 0, 2), (6, 63, 0, 2), (1, 63, 2, 1), (1, 63, 1, 0)]
        payloads = []
        for ss, se, ah, al in scans:
            bw = J._BitWriter()
            ew = J._EobrunWriter(bw)
            fn = J._encode_ac_refine if ah else J._encode_ac_first
            fn(ew, blocks, order, ss, se, al)
            payloads.append(bw.tobytes())
        comp = {
            "id": 1, "qid": 0, "h": 1, "v": 1,
            "nbx": nbx, "nby": 1, "sbx": nbx, "sby": 1, "dc": 0, "ac": 0,
        }
        coef = [np.zeros((1, nbx, 64), np.int32)]
        ht = {
            (1, 0): {(l, c): s for s, (l, c) in J._AC_PROG_CODES.items()},
            (0, 0): {(l, c): s for s, (l, c) in J._DC_CODES.items()},
        }
        for payload, (ss, se, ah, al) in zip(payloads, scans):
            J._decode_progressive_scan(
                J._BitReader(payload), [comp], [0], coef, ht,
                ss, se, ah, al, 0,
            )
        assert np.array_equal(coef[0], blocks)
