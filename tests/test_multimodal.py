"""Multimodal plumbing: binary payloads through Arrow-batched
mapInPandas with the stub codec; frame-sampling plan expansion."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.multimodal import (
    extract_media_features,
    frame_sample_plan,
)


@pytest.fixture()
def assets(spark):
    rows = [
        (1, "image/png", bytearray(b"\x89PNG fake image bytes 1")),
        (2, "image/png", bytearray(b"\x89PNG other image bytes longer 22")),
        (3, "audio/wav", bytearray(b"RIFF fake audio")),
    ]
    return spark.createDataFrame(
        rows, "asset_id bigint, mime string, payload binary"
    )


def test_extract_features_stub(spark, assets):
    out = extract_media_features(assets, decode_stub=True)
    rows = {r.asset_id: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    r1 = rows[1]
    assert r1.n_bytes == len(b"\x89PNG fake image bytes 1")
    assert r1.checksum == hashlib.md5(b"\x89PNG fake image bytes 1").hexdigest()
    assert 0 <= r1.width < 1920 and 0 <= r1.height < 1080
    assert 0.0 <= r1.feature_norm < 1.0
    # deterministic: re-run produces identical features
    again = {r.asset_id: r for r in extract_media_features(assets).collect()}
    assert again[1] == r1


def test_extract_features_repartitioned(spark, assets):
    out = extract_media_features(assets, decode_stub=True, target_partitions=2)
    assert out.count() == 3


def test_real_codec_path_raises_cleanly_for_undecodable_assets(spark, assets):
    # The real branch must fail honestly, never fabricate features:
    # the fixture's "image/png" payloads are garbage after the first
    # four signature bytes (since r10 a real PNG decoder exists and
    # must REJECT them — "bad signature"), and its "audio/wav" payload
    # is not actually RIFF (wave.Error). Either failure surfaces
    # depending on task completion order.
    out = extract_media_features(assets, decode_stub=False)
    with pytest.raises(
        Exception,
        match="bad signature|not a PNG|RIFF|wave",
    ):
        out.collect()


def test_real_codec_path_raises_not_implemented_for_absent_codec(spark):
    # A mime with genuinely no decoder branch keeps the honest-absence
    # contract visible end to end.
    df = spark.createDataFrame(
        [(9, "image/webp", bytearray(b"RIFF....WEBP fake"))],
        "asset_id bigint, mime string, payload binary",
    )
    out = extract_media_features(df, decode_stub=False)
    with pytest.raises(Exception, match="NotImplementedError|no stdlib decoder"):
        out.collect()


def _wav_bytes(rate=8000, n_ch=1, samples=()):
    """16-bit PCM WAV payload via the stdlib encoder."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(b"".join(struct.pack("<h", s) for s in samples))
    return buf.getvalue()


def _bmp_bytes(width, height, pixel_rows):
    """Minimal uncompressed 24bpp BMP: BITMAPFILEHEADER +
    BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes."""
    row_size = (width * 3 + 3) // 4 * 4
    pixel_data = b"".join(
        row + b"\x00" * (row_size - len(row)) for row in pixel_rows
    )
    header_size = 14 + 40
    file_size = header_size + len(pixel_data)
    file_header = b"BM" + file_size.to_bytes(4, "little") + b"\x00" * 4 + header_size.to_bytes(4, "little")
    info_header = (
        (40).to_bytes(4, "little")
        + width.to_bytes(4, "little", signed=True)
        + height.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + b"\x00" * 24
    )
    return file_header + info_header + pixel_data


def test_real_wav_decode_byte_exact(spark):
    """The REAL decode branch against a genuine (stdlib-encoded) WAV:
    sample rate, channel count, and RMS amplitude must be byte-exact."""
    import math

    samples = [16384, -16384, 16384, -16384]  # constant |amplitude| = 0.5
    payload = _wav_bytes(rate=44100, n_ch=1, samples=samples)
    assets = spark.createDataFrame(
        [(7, "audio/wav", bytearray(payload))],
        "asset_id bigint, mime string, payload binary",
    )
    r = extract_media_features(assets, decode_stub=False).collect()[0]
    assert r.n_bytes == len(payload)
    assert r.checksum == hashlib.md5(payload).hexdigest()
    assert r.width == 44100  # sample rate slot
    assert r.height == 1  # channel slot
    expected_rms = math.sqrt(sum(s * s for s in samples) / len(samples)) / 32768.0
    assert abs(r.feature_norm - expected_rms) < 1e-12


def test_real_bmp_decode_byte_exact(spark):
    """The REAL decode branch against a hand-built 24bpp BMP: pixel
    dimensions from the header, mean pixel value from the raster."""
    rows = [bytes([10, 20, 30, 40, 50, 60]), bytes([70, 80, 90, 100, 110, 120])]
    payload = _bmp_bytes(2, 2, rows)
    assets = spark.createDataFrame(
        [(8, "image/bmp", bytearray(payload))],
        "asset_id bigint, mime string, payload binary",
    )
    r = extract_media_features(assets, decode_stub=False).collect()[0]
    assert (r.width, r.height) == (2, 2)
    # 2px * 3 bytes = 6-byte rows, already 4-byte-aligned? 6 % 4 != 0 →
    # 2 pad bytes per row; the mean is over raster bytes incl. padding.
    row_size = (2 * 3 + 3) // 4 * 4
    raster = b"".join(row + b"\x00" * (row_size - len(row)) for row in rows)
    expected = (sum(raster) / len(raster)) / 255.0
    assert abs(r.feature_norm - expected) < 1e-12
    assert r.checksum == hashlib.md5(payload).hexdigest()


def test_binaryfile_ingest_to_real_decode_end_to_end(spark, tmp_path):
    """Full multimodal path: media files on disk → binaryFile source
    (sources/readers.read_binary_assets) → Arrow-batched REAL decode.
    Ids are path-hash stable, mimes come from extensions, payloads
    cross both boundaries (file scan, Python transition) byte-exact."""
    from data_warehouse_migration_spark.sources.readers import read_binary_assets

    wav = _wav_bytes(rate=16000, n_ch=2, samples=[1000, -1000, 2000, -2000])
    bmp = _bmp_bytes(2, 1, [bytes([255, 0, 0, 0, 255, 0])])
    (tmp_path / "a.wav").write_bytes(wav)
    (tmp_path / "b.bmp").write_bytes(bmp)
    (tmp_path / "notes.txt").write_bytes(b"not media")

    assets = read_binary_assets(spark, str(tmp_path), path_glob="*.{wav,bmp}")
    rows = {r.source_uri.rsplit("/", 1)[-1]: r for r in assets.collect()}
    assert set(rows) == {"a.wav", "b.bmp"}, "glob filtered the txt file"
    assert rows["a.wav"].mime == "audio/wav"
    assert rows["b.bmp"].mime == "image/bmp"
    assert bytes(rows["a.wav"].payload) == wav

    feats = {
        r.mime: r
        for r in extract_media_features(assets, decode_stub=False).collect()
    }
    assert feats["audio/wav"].width == 16000  # sample rate survives e2e
    assert feats["audio/wav"].height == 2
    assert feats["image/bmp"].width == 2 and feats["image/bmp"].height == 1
    assert feats["image/bmp"].checksum == hashlib.md5(bmp).hexdigest()

    # metadata-only query never touches payload bytes (column pruning)
    plan = assets.select("n_bytes")._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


def test_multimodal_pipeline_end_to_end(spark, tmp_path):
    """Composed multimodal pipeline over real files: binaryFile ingest →
    Arrow-batched real decode → exact dedup on payload checksum →
    per-mime stats. Two of the four WAVs are byte-identical, so the
    dedup stage must collapse them; counts and rates survive the full
    chain."""
    from data_warehouse_migration_spark.sources.readers import read_binary_assets

    dup = _wav_bytes(rate=8000, n_ch=1, samples=[100, -100] * 8)
    uniq = _wav_bytes(rate=22050, n_ch=1, samples=[5000, -5000])
    bmp = _bmp_bytes(2, 1, [bytes([1, 2, 3, 4, 5, 6])])
    (tmp_path / "dup_a.wav").write_bytes(dup)
    (tmp_path / "dup_b.wav").write_bytes(dup)
    (tmp_path / "uniq.wav").write_bytes(uniq)
    (tmp_path / "img.bmp").write_bytes(bmp)

    assets = read_binary_assets(spark, str(tmp_path), path_glob="*.{wav,bmp}")
    feats = extract_media_features(assets, decode_stub=False)

    from pyspark.sql import functions as F

    deduped = (
        feats.groupBy("checksum")
        .agg(
            F.min("asset_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
            F.first("mime").alias("mime"),
            F.first("width").alias("width"),
        )
    )
    rows = deduped.collect()
    assert len(rows) == 3, "byte-identical WAVs collapse to one asset"
    by_ck = {r.checksum: r for r in rows}
    assert by_ck[hashlib.md5(dup).hexdigest()].n_copies == 2
    assert by_ck[hashlib.md5(uniq).hexdigest()].width == 22050
    stats = {
        r.mime: r.n
        for r in deduped.groupBy("mime").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert stats == {"audio/wav": 2, "image/bmp": 1}


def test_frame_sample_plan(spark):
    vids = spark.createDataFrame(
        [(1, 12.0), (2, 3.0), (3, 0.0)], "asset_id bigint, duration_s double"
    )
    out = frame_sample_plan(vids, every_n_seconds=5)
    got = sorted((r.asset_id, r.frame_ts) for r in out.collect())
    assert got == [(1, 0), (1, 5), (1, 10), (2, 0), (3, 0)]
    # pure JVM plan: no Python (mapInPandas/BatchEvalPython) stage
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_resize_media_known_values(spark):
    """Crafted 4×2 BMP + tiny WAV through the real resize: dims,
    integer checksum of the selected bytes/samples, and the
    unsupported-mime guard."""
    import io
    import struct
    import wave

    import pytest
    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.multimodal import resize_media

    # BMP 4x2, pixel bytes 0..23 (rows of 12, no padding)
    npx = 24
    px = bytes(range(npx))
    bmp = (
        struct.pack("<2sIHHI", b"BM", 54 + npx, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 24, 0, npx, 0, 0, 0, 0)
        + px
    )
    # WAV: samples 10, -20, 30, -40 → select [10, 30]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(int(s).to_bytes(2, "little", signed=True) for s in (10, -20, 30, -40))
        )
    assets = spark.createDataFrame(
        [(1, "image/bmp", bmp), (2, "audio/wav", buf.getvalue())],
        "asset_id long, mime string, payload binary",
    )
    out = {r.asset_id: r for r in resize_media(assets).collect()}
    # BMP row 0 (stored first), cols 0 and 2 → bytes {0,1,2, 6,7,8} sum 24
    assert (out[1].out_w, out[1].out_h, out[1].checksum) == (2, 1, 24)
    assert (out[2].out_w, out[2].out_h, out[2].checksum) == (2, 1, 40)

    bad = spark.createDataFrame(
        [(3, "video/mp4", b"x")], "asset_id long, mime string, payload binary"
    )
    with pytest.raises(Exception, match="no resize"):
        resize_media(bad).collect()


def test_quarantine_isolates_bad_assets(spark):
    """One malformed asset in a batch quarantines ONE row; the good
    rows' features are byte-identical to the strict path's (VERDICT
    r11 action #1)."""
    import io
    import struct
    import wave

    from data_warehouse_migration_spark.operators.multimodal import (
        extract_media_features_quarantine,
        media_quarantine_report,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(
            b"".join(
                int(s).to_bytes(2, "little", signed=True)
                for s in (100, -100, 100, -100)
            )
        )
    good_wav = buf.getvalue()
    npx = 24
    good_bmp = (
        struct.pack("<2sIHHI", b"BM", 54 + npx, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 4, 2, 1, 24, 0, npx, 0, 0, 0, 0)
        + bytes(range(npx))
    )
    sof9 = b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    rows = [
        (1, "audio/wav", bytearray(good_wav)),
        (2, "image/jpeg", bytearray(sof9)),          # arithmetic coding
        (3, "image/bmp", bytearray(b"XX" + good_bmp[2:])),  # bad magic
        (4, "image/bmp", bytearray(good_bmp)),
        (5, "application/x-unknown", bytearray(b"????")),   # no decoder
    ]
    assets = spark.createDataFrame(
        rows, "asset_id bigint, mime string, payload binary"
    ).coalesce(1)  # one Arrow batch: the faults share a task with the good rows

    out = {r.asset_id: r for r in
           extract_media_features_quarantine(assets).collect()}
    assert [out[i].status for i in (1, 2, 3, 4, 5)] == [
        "ok", "quarantined", "quarantined", "ok", "quarantined"
    ]
    # good rows match the strict path exactly
    strict = {
        r.asset_id: r
        for r in extract_media_features(
            assets.where(F.col("asset_id").isin(1, 4)), decode_stub=False
        ).collect()
    }
    for i in (1, 4):
        for col in ("n_bytes", "checksum", "width", "height", "feature_norm"):
            assert getattr(out[i], col) == getattr(strict[i], col)
    # quarantined rows: null features, classed reasons
    assert out[2].width is None and out[2].feature_norm is None
    assert out[2].reason.startswith("NotImplementedError:")
    assert "0xc9" in out[2].reason
    assert out[3].reason.startswith("ValueError: not a BMP payload")
    assert out[5].reason.startswith("NotImplementedError:")

    report = {
        (r.mime, r.status, r.reason_class): r.n_assets
        for r in media_quarantine_report(
            extract_media_features_quarantine(assets)
        ).collect()
    }
    assert report[("image/jpeg", "quarantined", "NotImplementedError")] == 1
    assert report[("image/bmp", "quarantined", "ValueError")] == 1
    assert report[("image/bmp", "ok", None)] == 1


def test_strict_path_still_raises(spark):
    """The exact-decode gates depend on a raise being the assertion —
    strict mode must NOT quarantine."""
    bad = spark.createDataFrame(
        [(9, "image/bmp", bytearray(b"XXnot a bmp"))],
        "asset_id bigint, mime string, payload binary",
    )
    with pytest.raises(Exception, match="not a BMP payload"):
        extract_media_features(bad, decode_stub=False).collect()


def test_real_decode_tiff_branch(spark):
    """image/tiff payloads flow through the production extractor
    (r12: the TIFF rung joined _decode_real_asset)."""
    import numpy as np

    from data_warehouse_migration_spark.functions.tiff import encode_tiff

    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    assets = spark.createDataFrame(
        [(7, "image/tiff", bytearray(encode_tiff(img, "lzw")))],
        "asset_id bigint, mime string, payload binary",
    )
    row = extract_media_features(assets, decode_stub=False).collect()[0]
    assert (row.width, row.height) == (8, 6)
    assert abs(row.feature_norm - float(img.mean()) / 255.0) < 1e-9
