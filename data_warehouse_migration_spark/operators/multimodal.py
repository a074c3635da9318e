"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (north-star extension, BASELINE.json).

Design (the part that matters at 100 TB and is fully real here):
- payloads are ``BinaryType`` columns riding next to typed metadata
  (mime, width/height/duration, source uri) — one row per asset;
  Parquet stores the bytes column-oriented and prunes it when a query
  never touches the payload;
- decode / feature-extract run as **Arrow-batched** ``mapInPandas``
  over batches of payloads — the only sane shape for Python media
  codecs on Spark (one Python transition per batch, not per row);
- partitioning: assets are independent → embarrassingly parallel; the
  operator repartitions by a size-balanced key when asked so one giant
  video doesn't skew a task.

Codec posture: third-party media libraries (PIL/librosa/av) are not in
this container, so ``decode_stub=True`` (the catalog-query default)
produces deterministic fake features (byte-length, a rolling checksum,
fake dims). The REAL branch (``decode_stub=False``) is nevertheless
exercised end-to-end for the formats decodable WITHOUT third-party
libraries — WAV (``wave``), BMP (header parse), and since r9 baseline
grayscale JPEG (``functions/jpeg``, pure numpy: real Huffman entropy
decode + IDCT) — so the Arrow batching, the schema, and the byte
fidelity of the Python transition are tested against real payloads
(tests/test_multimodal.py, tests/test_jpeg_codec.py); any richer
codec slots into ``_decode_real_asset`` per mime type.
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output schema of the feature extractor (DDL form).
MEDIA_FEATURES_SCHEMA = (
    "asset_id bigint, mime string, n_bytes int, checksum string,"
    " width int, height int, feature_norm double"
)


def _decode_real_asset(mime: str, payload: bytes) -> tuple[int, int, float]:
    """Real decode of one asset → (width, height, feature_norm).

    Stdlib-decodable formats only; the slot mapping per media kind:
    - ``audio/wav``: (sample_rate, n_channels, RMS amplitude in [0, 1])
      — frames parsed with ``wave`` + numpy, 16-bit PCM.
    - ``image/bmp``: (width_px, height_px, mean pixel byte / 255) —
      BITMAPINFOHEADER parse, uncompressed payloads.
    Anything else raises ``NotImplementedError`` (honest absence: this
    container has no PIL/librosa/av; a richer codec adds a branch here
    without touching schema/batching/plumbing).
    """
    import numpy as np

    if mime in ("audio/wav", "audio/x-wav"):
        # r11: our own RIFF walk (functions/pcm_audio) replaced the
        # stdlib ``wave`` subset — PCM 8/16/24/32, IEEE float32, and
        # G.711 µ-law/A-law all decode now (16-bit output verified
        # sample-exact against ``wave`` in tests/test_pcm_audio.py).
        from data_warehouse_migration_spark.functions.pcm_audio import (
            decode_wav,
        )

        samples, rate, bits = decode_wav(bytes(payload))
        x = samples.astype("float64")
        # float32 WAV is already in [-1, 1]; integer formats normalize
        # by their full scale
        full = 1.0 if samples.dtype.kind == "f" else float(1 << (bits - 1))
        rms = float(np.sqrt((x**2).mean())) / full if x.size else 0.0
        return rate, samples.shape[1], rms
    if mime in ("audio/basic", "audio/au"):
        # Sun audio (r11): PCM 8/16/24/32 big-endian + G.711.
        from data_warehouse_migration_spark.functions.pcm_audio import (
            decode_au,
        )

        samples, rate, bits = decode_au(bytes(payload))
        x = samples.astype("float64")
        rms = (
            float(np.sqrt((x**2).mean())) / float(1 << (bits - 1))
            if x.size
            else 0.0
        )
        return rate, samples.shape[1], rms
    if mime in ("audio/aiff", "audio/x-aiff"):
        # AIFF/AIFC (r11): big-endian PCM + G.711 AIFC.
        from data_warehouse_migration_spark.functions.pcm_audio import (
            decode_aiff,
        )

        samples, rate, bits = decode_aiff(bytes(payload))
        x = samples.astype("float64")
        rms = (
            float(np.sqrt((x**2).mean())) / float(1 << (bits - 1))
            if x.size
            else 0.0
        )
        return rate, samples.shape[1], rms
    if mime in ("audio/flac", "audio/x-flac"):
        # From-scratch RFC 9639 tier (functions/flac — r11): CRC-8/
        # CRC-16-verified frame walk, Rice/Rice2 residual decode,
        # CONSTANT/VERBATIM/FIXED/LPC subframes, the three stereo
        # decorrelations, STREAMINFO MD5 verified against the decoded
        # audio. Same slot mapping as WAV: (rate, channels, RMS).
        from data_warehouse_migration_spark.functions.flac import decode_flac

        samples, rate, bps = decode_flac(bytes(payload))
        full = float(1 << (bps - 1))
        rms = (
            float(np.sqrt((samples.astype("float64") ** 2).mean())) / full
            if samples.size
            else 0.0
        )
        return rate, samples.shape[1], rms
    if mime in ("video/avi", "video/x-msvideo"):
        # From-scratch RIFF/AVI tier (functions/avi — r11): full
        # container walk (avih/strl/movi/idx1, index cross-checked
        # against the real chunk layout), MJPEG frames decoded by the
        # attested functions/jpeg rung. Slot mapping for video:
        # (width, height, mean pixel of FRAME 0 / 255) — first-frame
        # semantics, same convention as animated GIF. Non-MJPEG
        # handlers raise inside the parser with the reason.
        from data_warehouse_migration_spark.functions.avi import parse_avi
        from data_warehouse_migration_spark.functions.jpeg import (
            decode_jpeg_auto,
        )

        meta = parse_avi(bytes(payload))
        if meta["handler"] not in (b"MJPG", b"mjpg"):
            raise NotImplementedError(
                f"only MJPEG AVI decodes here, got {meta['handler']!r}"
            )
        px = decode_jpeg_auto(meta["frames"][0])
        mean_norm = float(px.mean()) / 255.0 if px.size else 0.0
        return meta["width"], meta["height"], mean_norm
    if mime == "image/bmp":
        if payload[:2] != b"BM":
            raise ValueError("not a BMP payload")
        width_px = int.from_bytes(payload[18:22], "little", signed=True)
        height_px = int.from_bytes(payload[22:26], "little", signed=True)
        pixel_offset = int.from_bytes(payload[10:14], "little")
        pixels = np.frombuffer(payload[pixel_offset:], dtype="uint8")
        mean_norm = float(pixels.mean()) / 255.0 if pixels.size else 0.0
        return width_px, abs(height_px), mean_norm
    if mime == "image/jpeg":
        # Baseline sequential (functions/jpeg — r9) AND progressive
        # SOF2 (r11, VERDICT r10 action #3), dispatched on the frame
        # marker: real DQT/DHT parse, Huffman entropy decode —
        # spectral selection, successive approximation, EOB runs on
        # the progressive side — IDCT; grayscale and YCbCr at
        # sampling factors 1-2. Arithmetic coding and >2 sampling
        # raise inside the codec with the reason. feature_norm =
        # mean over all decoded channels / 255.
        from data_warehouse_migration_spark.functions.jpeg import (
            decode_jpeg_auto,
        )

        px = decode_jpeg_auto(payload)
        mean_norm = float(px.mean()) / 255.0 if px.size else 0.0
        return int(px.shape[1]), int(px.shape[0]), mean_norm
    if mime == "image/png":
        # From-scratch RFC 2083/1950/1951 tier (functions/png — r10):
        # CRC-verified chunk walk, own full inflate (stored + fixed +
        # dynamic Huffman + LZ77), exact filter inversion. 8-bit
        # gray/RGB non-interlaced; palette/alpha/16-bit/Adam7 raise
        # inside the codec with the reason.
        from data_warehouse_migration_spark.functions.png import decode_png

        px = decode_png(bytes(payload))
        mean_norm = float(px.mean()) / 255.0 if px.size else 0.0
        return int(px.shape[1]), int(px.shape[0]), mean_norm
    if mime in ("image/tiff", "image/tif"):
        # Baseline TIFF 6.0 (functions/tiff — r12): II/MM, strips,
        # none/PackBits/LZW (the PDF-shared EarlyChange variant),
        # Predictor 2, palette ColorMap. Tiles/BigTIFF/planar-2 raise
        # inside the codec with the reason (quarantine-routable).
        from data_warehouse_migration_spark.functions.tiff import decode_tiff

        px = decode_tiff(bytes(payload))
        mean_norm = float(px.mean()) / 255.0 if px.size else 0.0
        return int(px.shape[1]), int(px.shape[0]), mean_norm
    if mime == "image/gif":
        # From-scratch GIF87a/89a tier (functions/gif — r10): real
        # variable-width LZW, sub-block framing, global/local color
        # tables, 4-pass deinterlacing. Animated / sub-rectangle
        # streams (r11) decode with FRAME-0 semantics through the
        # compositor (transparency as deltas over the background
        # canvas, disposal handled for later frames).
        from data_warehouse_migration_spark.functions.gif import (
            decode_gif_frame0,
        )

        px = decode_gif_frame0(bytes(payload))
        mean_norm = float(px.mean()) / 255.0 if px.size else 0.0
        return int(px.shape[1]), int(px.shape[0]), mean_norm
    raise NotImplementedError(
        f"no stdlib decoder for mime {mime!r}; install a codec and add a "
        "branch in _decode_real_asset"
    )


def _decode_batch(pdf: pd.DataFrame, decode_stub: bool) -> pd.DataFrame:
    """Decode one Arrow batch of assets → features."""
    if not decode_stub:
        decoded = [
            _decode_real_asset(m, bytes(p))
            for m, p in zip(pdf["mime"], pdf["payload"])
        ]
        return pd.DataFrame(
            {
                "asset_id": pdf["asset_id"],
                "mime": pdf["mime"],
                "n_bytes": pdf["payload"].map(len).astype("int32"),
                "checksum": pdf["payload"].map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
                "width": pd.Series(
                    [d[0] for d in decoded], index=pdf.index, dtype="int32"
                ),
                "height": pd.Series(
                    [d[1] for d in decoded], index=pdf.index, dtype="int32"
                ),
                "feature_norm": pd.Series(
                    [d[2] for d in decoded], index=pdf.index, dtype="float64"
                ),
            }
        )
    payloads = pdf["payload"]
    n_bytes = payloads.map(len)
    checksum = payloads.map(lambda b: hashlib.md5(b).hexdigest())
    # deterministic fake "decoded" dimensions + feature norm
    crc = payloads.map(lambda b: zlib.crc32(b))
    return pd.DataFrame(
        {
            "asset_id": pdf["asset_id"],
            "mime": pdf["mime"],
            "n_bytes": n_bytes.astype("int32"),
            "checksum": checksum,
            "width": (crc % 1920).astype("int32"),
            "height": (crc // 1920 % 1080).astype("int32"),
            "feature_norm": (crc % 10_000) / 10_000.0,
        }
    )


#: Output schema of the fault-tolerant extractor: the feature columns
#: (null for quarantined rows) plus a per-asset disposition.
MEDIA_QUARANTINE_SCHEMA = (
    MEDIA_FEATURES_SCHEMA + ", status string, reason string"
)


def _decode_batch_quarantine(pdf: pd.DataFrame) -> pd.DataFrame:
    """Real-decode one Arrow batch with PER-ASSET fault isolation
    (VERDICT r11 action #1): one malformed or unsupported payload —
    an arithmetic-coded JPEG, a truncated gzip member, an encrypted
    PDF — must quarantine ONE ROW, not fail the task 4× and kill the
    job, because at 100 TB corrupt inputs are a certainty, not an
    edge case. Each asset decodes under its own catch; failures emit
    ``status='quarantined'`` with ``reason`` = ``ExcClass: message``
    and null features, successes emit ``status='ok'`` and the exact
    features :func:`_decode_batch` would. The strict path (the gate
    harnesses, where a raise IS the assertion) stays byte-identical
    in :func:`_decode_batch`."""
    rows = []
    for aid, mime, payload in zip(
        pdf["asset_id"], pdf["mime"], pdf["payload"]
    ):
        raw = bytes(payload)
        base = (int(aid), str(mime), len(raw), hashlib.md5(raw).hexdigest())
        try:
            w, h, norm = _decode_real_asset(str(mime), raw)
        except Exception as exc:  # noqa: BLE001 — untrusted input boundary
            rows.append(
                base
                + (None, None, None, "quarantined",
                   f"{type(exc).__name__}: {exc}")
            )
        else:
            rows.append(base + (w, h, norm, "ok", None))
    return pd.DataFrame(
        rows,
        columns=[
            "asset_id", "mime", "n_bytes", "checksum",
            "width", "height", "feature_norm", "status", "reason",
        ],
    )


def extract_media_features_quarantine(
    assets: DataFrame, target_partitions: int | None = None
) -> DataFrame:
    """Fault-tolerant real-decode feature extraction — the PRODUCTION
    entry point for crawl-scale corpora (:func:`extract_media_features`
    with ``decode_stub=False`` is the strict twin the exact-decode
    gates drive; its raise-on-malformed posture is correct at the
    codec API but a job-killer at the stage level). Same input
    contract and Arrow-batched ``mapInPandas`` shape; output adds
    ``(status, reason)`` and nulls the feature columns for
    quarantined rows so callers can route them to a dead-letter lane
    (``media_quarantine_report`` / ``operators.quality.split_quarantine``)
    without losing the batch."""
    if target_partitions:
        assets = assets.repartition(target_partitions, F.col("asset_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch_quarantine(pdf)

    return assets.select("asset_id", "mime", "payload").mapInPandas(
        run, schema=MEDIA_QUARANTINE_SCHEMA
    )


def media_quarantine_report(feats: DataFrame) -> DataFrame:
    """Aggregate a quarantine run into the dead-letter report a crawl
    operator reads: per (mime, status, reason_class) asset counts and
    byte totals. reason_class is the exception class alone — messages
    carry asset-specific detail, the class is the triage key."""
    return (
        feats.groupBy(
            "mime",
            "status",
            F.split_part(F.col("reason"), F.lit(":"), F.lit(1)).alias(
                "reason_class"
            ),
        )
        .agg(
            F.count("*").alias("n_assets"),
            F.sum("n_bytes").alias("total_bytes"),
        )
    )


def extract_media_features(
    assets: DataFrame,
    decode_stub: bool = True,
    target_partitions: int | None = None,
) -> DataFrame:
    """Feature-extract a multimodal asset table.

    Input columns: ``asset_id bigint, mime string, payload binary``
    (extra metadata columns pass through the scan untouched — they are
    simply not consumed here).
    """
    if target_partitions:
        # size balance: hash the id, not the payload (no byte shuffle
        # beyond the repartition itself)
        assets = assets.repartition(target_partitions, F.col("asset_id"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf, decode_stub)

    return assets.select("asset_id", "mime", "payload").mapInPandas(
        run, schema=MEDIA_FEATURES_SCHEMA
    )


def synthesize_assets(ids_df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """Deterministic multimodal payloads from integer ids — REAL format
    bytes (16-bit PCM WAV via the stdlib ``wave`` writer; 24-bpp BMP
    with hand-built BITMAPINFOHEADER), reproducible bit-for-bit from
    the id alone:

    - even ids → mono WAV, rate ``8000 + 1000·(id%3)``,
      ``100 + id%50`` samples, sample j = ``(id·31 + j·17) % 2001 −
      1000`` (44-byte header ⇒ ``n_bytes = 44 + 2·n``);
    - odd ids → 4×``(2 + id%3)`` BMP, pixel byte p =
      ``(id·7 + p) % 256`` (width 4 ⇒ 12-byte rows, no padding;
      54-byte header ⇒ ``n_bytes = 54 + 12·h``).

    Every decoded property (rate, dims, RMS, pixel mean) is therefore
    a CLOSED-FORM function of the id that a SQL oracle recomputes
    without touching bytes — which is what lets the real-decode branch
    of :func:`extract_media_features` carry a value oracle
    (``media_feature_extract_real``). Runs as Arrow-batched
    ``mapInPandas`` like the decoder itself."""
    import io
    import struct
    import wave

    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, payloads = [], [], []
            for raw in pdf[id_col]:
                aid = int(raw)
                if aid % 2 == 0:
                    n = 100 + aid % 50
                    rate = 8000 + 1000 * (aid % 3)
                    samples = np.array(
                        [(aid * 31 + j * 17) % 2001 - 1000 for j in range(n)],
                        dtype="<i2",
                    )
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(rate)
                        w.writeframes(samples.tobytes())
                    mimes.append("audio/wav")
                    payloads.append(buf.getvalue())
                else:
                    h = 2 + aid % 3
                    npx = 12 * h
                    px = bytes((aid * 7 + p) % 256 for p in range(npx))
                    header = struct.pack(
                        "<2sIHHI", b"BM", 54 + npx, 0, 0, 54
                    ) + struct.pack(
                        "<IiiHHIIiiII", 40, 4, h, 1, 24, 0, npx, 0, 0, 0, 0
                    )
                    mimes.append("image/bmp")
                    payloads.append(header + px)
                ids.append(aid)
            yield pd.DataFrame(
                {id_col: ids, "mime": mimes, "payload": payloads}
            )

    return ids_df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} bigint, mime string, payload binary"
    )


def synthesize_container_assets(
    ids_df: DataFrame, id_col: str = "asset_id"
) -> DataFrame:
    """Deterministic AU/AIFF payloads from integer ids (r11) — the
    container-tier companion to :func:`synthesize_assets` (which
    stays WAV/BMP because the in-window resize gate consumes it):

    - even ids → mono Sun AU, G.711 µ-LAW: ``80 + id%40`` samples,
      code ``j = (id·11 + j·7) % 256`` — the SIGNAL is the expanded
      codebook, so decode is exact and the 24-byte header makes
      ``n_bytes = 24 + n`` closed-form;
    - odd ids → stereo 16-bit AIFF at 11025 Hz: ``60 + id%30``
      frames, sample ``(j, c) = (id·13 + j·19 + c·37) % 4001 − 2000``
      (deterministic IFF layout ⇒ ``n_bytes = 54 + 4·n``).

    Every decoded property is a closed-form function of the id —
    including the µ-law RMS, via the published expansion formula in
    plain integer SQL — which is what lets ``_decode_real_asset``'s
    AU/AIFF branches carry a value oracle through the SAME
    ``extract_media_features`` path production uses
    (``media_feature_extract_containers``)."""
    import numpy as np

    from data_warehouse_migration_spark.functions.pcm_audio import (
        encode_aiff,
        encode_au,
        ulaw_to_linear,
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, payloads = [], [], []
            for raw in pdf[id_col]:
                aid = int(raw)
                if aid % 2 == 0:
                    n = 80 + aid % 40
                    codes = ((aid * 11 + np.arange(n) * 7) % 256).astype(
                        np.uint8
                    )
                    sig = ulaw_to_linear(codes).astype(np.int64)
                    mimes.append("audio/basic")
                    payloads.append(encode_au(sig, 8000, "ulaw"))
                else:
                    n = 60 + aid % 30
                    j = np.arange(n).reshape(n, 1)
                    c = np.arange(2).reshape(1, 2)
                    sig = (aid * 13 + j * 19 + c * 37) % 4001 - 2000
                    mimes.append("audio/aiff")
                    payloads.append(encode_aiff(sig, 11025, 16))
                ids.append(aid)
            yield pd.DataFrame(
                {id_col: ids, "mime": mimes, "payload": payloads}
            )

    return ids_df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} bigint, mime string, payload binary"
    )


def synthesize_faulty_assets(
    ids_df: DataFrame, id_col: str = "asset_id"
) -> DataFrame:
    """Deterministic MIXED-HEALTH payloads from integer ids — the
    corrupt-corpus companion to :func:`synthesize_assets` that the
    ``media_decode_quarantine`` gate feeds through
    :func:`extract_media_features_quarantine`. Rotation on id mod 8:

    - 0, 4 → GOOD mono WAV, the exact :func:`synthesize_assets` even
      formula (n = ``100 + id%50`` samples, rate ``8000 + 1000·(id%3)``,
      sample j = ``(id·31 + j·17) % 2001 − 1000``) — features must
      come through the quarantine path UNCHANGED;
    - 1, 5 → GOOD 4×``(2 + id%3)`` BMP, the odd formula (pixel byte
      p = ``(id·7 + p) % 256``) — same requirement;
    - 2, 6 → an ARITHMETIC-CODED JPEG header (SOI + SOF9, 15 bytes) —
      a real format this engine honestly does not decode
      (functions/jpeg raises ``NotImplementedError``); the stage must
      quarantine it, not die;
    - 3 → a corrupt BMP (magic bytes overwritten; body intact, so
      ``n_bytes = 54 + 12·h`` still holds) → ``ValueError``;
    - 7 → an unsupported mime (``application/pdf``, payload
      ``%PDF-1.7 {id}`` ⇒ ``n_bytes = 9 + len(str(id))``) →
      ``NotImplementedError`` from the dispatch itself.

    Every branch's n_bytes — and the good branches' features — are
    closed forms over the id, so the DuckDB oracle attests BOTH that
    corrupt rows land in quarantine with the right reason class AND
    that good rows' values are untouched by the fault handling."""
    import io
    import struct
    import wave

    import numpy as np

    _SOF9_JPEG = (
        b"\xff\xd8\xff\xc9\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, mimes, payloads = [], [], []
            for raw in pdf[id_col]:
                aid = int(raw)
                leg = aid % 8
                if leg in (0, 4):
                    n = 100 + aid % 50
                    rate = 8000 + 1000 * (aid % 3)
                    samples = np.array(
                        [(aid * 31 + j * 17) % 2001 - 1000 for j in range(n)],
                        dtype="<i2",
                    )
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(rate)
                        w.writeframes(samples.tobytes())
                    mimes.append("audio/wav")
                    payloads.append(buf.getvalue())
                elif leg in (2, 6):
                    mimes.append("image/jpeg")
                    payloads.append(_SOF9_JPEG)
                elif leg == 7:
                    mimes.append("application/pdf")
                    payloads.append(f"%PDF-1.7 {aid}".encode("ascii"))
                else:  # 1, 5 good BMP; 3 the same BMP with a broken magic
                    h = 2 + aid % 3
                    npx = 12 * h
                    px = bytes((aid * 7 + p) % 256 for p in range(npx))
                    header = struct.pack(
                        "<2sIHHI", b"BM", 54 + npx, 0, 0, 54
                    ) + struct.pack(
                        "<IiiHHIIiiII", 40, 4, h, 1, 24, 0, npx, 0, 0, 0, 0
                    )
                    blob = header + px
                    if leg == 3:
                        blob = b"XX" + blob[2:]
                    mimes.append("image/bmp")
                    payloads.append(blob)
                ids.append(aid)
            yield pd.DataFrame(
                {id_col: ids, "mime": mimes, "payload": payloads}
            )

    return ids_df.select(id_col).mapInPandas(
        gen, schema=f"{id_col} bigint, mime string, payload binary"
    )


def frame_sample_plan(
    assets: DataFrame,
    every_n_seconds: int = 5,
    duration_col: str = "duration_s",
) -> DataFrame:
    """Expand each video asset into (asset_id, frame_ts) sampling rows —
    pure Column expressions (sequence+explode), no decode needed: the
    plan that a downstream decode stage consumes. Demonstrates that
    multimodal *planning* stays JVM-side; only pixel work pays the
    Python tax."""
    return assets.select(
        "asset_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col(duration_col).cast("int") - 1, F.lit(0)),
                F.lit(every_n_seconds),
            )
        ).alias("frame_ts"),
    )


def resize_media(assets: DataFrame) -> DataFrame:
    """REAL media downsampling — the 'resize' leg of the multimodal
    contract (decode / feature-extract / resize / frame-sample):
    nearest-neighbor 2× reduction applied to decoded payloads inside
    the same Arrow-batched ``mapInPandas`` shape as the decoder.

    - 16-bit PCM WAV → every other sample (2× decimation; a production
      resampler slots into the same per-asset function);
    - 24-bpp BMP → every other stored row and every other pixel within
      the row (selection is defined on the RAW pixel buffer — BMP
      stores rows bottom-up, and nearest-neighbor is order-symmetric,
      so buffer-order selection keeps the math byte-honest).

    Output per asset: ``(asset_id, mime, out_w, out_h, checksum,
    feature_norm)`` where checksum is the EXACT integer sum of the
    selected samples/bytes (attests the selection itself, not just a
    rounded aggregate) and feature_norm is RMS/32768 (audio) or mean
    pixel/255 (image), rounded to 6. Every value is a closed-form
    function of the synthesized asset id, so the DuckDB oracle
    recomputes the resize by formula (``media_resize_real``).

    Scale: assets are independent rows; one Python stage, no shuffle.
    """
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "asset_id": [], "mime": [], "out_w": [], "out_h": [],
                "checksum": [], "feature_norm": [],
            }
            for aid, mime, payload in zip(
                pdf["asset_id"], pdf["mime"], pdf["payload"]
            ):
                if mime == "audio/wav":
                    import io
                    import wave

                    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                        frames = w.readframes(w.getnframes())
                    samples = np.frombuffer(frames, dtype="<i2")[::2]
                    norm = round(
                        float(
                            np.sqrt((samples.astype("float64") ** 2).mean())
                        )
                        / 32768.0,
                        6,
                    )
                    out_w, out_h = len(samples), 1
                    checksum = int(samples.astype("int64").sum())
                elif mime == "image/bmp":
                    raw = bytes(payload)
                    off = int.from_bytes(raw[10:14], "little")
                    width = int.from_bytes(raw[18:22], "little", signed=True)
                    height = int.from_bytes(raw[22:26], "little", signed=True)
                    row_bytes = ((width * 3 + 3) // 4) * 4
                    px = np.frombuffer(
                        raw[off : off + row_bytes * height], dtype="u1"
                    ).reshape(height, row_bytes)[:, : width * 3].reshape(
                        height, width, 3
                    )
                    sel = px[::2, ::2, :]
                    norm = round(float(sel.mean()) / 255.0, 6)
                    out_h, out_w = sel.shape[0], sel.shape[1]
                    checksum = int(sel.astype("int64").sum())
                else:
                    raise NotImplementedError(f"no resize for {mime}")
                out["asset_id"].append(int(aid))
                out["mime"].append(mime)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["checksum"].append(checksum)
                out["feature_norm"].append(norm)
            yield pd.DataFrame(out)

    return assets.mapInPandas(
        run,
        schema=(
            "asset_id bigint, mime string, out_w int, out_h int, "
            "checksum bigint, feature_norm double"
        ),
    )


def _codec_roundtrip_features(
    ids_df: DataFrame, id_col: str, per_id
) -> DataFrame:
    """Shared harness for the codec round-trip gates (JPEG/PNG/GIF):
    one Arrow-batched ``mapInPandas`` stage mapping each id through
    ``per_id(aid) -> (width, height, pixel_sum)`` — the
    generate→encode→decode→sum closure each gate supplies. One
    definition so the batching loop, row assembly, and schema can
    never drift apart across the codec family."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(int(a), *per_id(int(a))) for a in pdf[id_col]]
            yield pd.DataFrame(
                rows, columns=[id_col, "width", "height", "pixel_sum"]
            )

    return ids_df.mapInPandas(
        run, schema=f"{id_col} bigint, width int, height int, pixel_sum bigint"
    )


def jpeg_roundtrip_features(
    ids_df: DataFrame, id_col: str = "asset_id", mode: str = "gray"
) -> DataFrame:
    """REAL JPEG encode→bytes→decode, value-attestable end to end
    (VERDICT r8 action #6c): per id, a deterministic 16×16 grayscale
    image of four solid 8×8 tiles (tile (i,j) value = ``2·((id·7 +
    i·5 + j·3) mod 128)``) is encoded to a baseline JFIF stream and
    decoded back by the general grayscale decoder
    (``functions/jpeg``), all inside one Arrow-batched
    ``mapInPandas``; the output is the DECODED pixel sum.

    Why the closed form is legitimate (and thus DuckDB-attestable): a
    solid 8×8 block is DC-only, and an EVEN level-shifted value keeps
    DC = 8·(v−128) divisible by the luminance quantizer's Q₀₀ = 16 —
    quantization is exact, so decode(encode(img)) == img bit-for-bit
    and the decoded pixel sum equals ``64·Σ v_ij`` by arithmetic, NOT
    by trusting the codec. Any defect in marker parsing, Huffman
    tables, DC prediction, zigzag, or the IDCT scaling breaks the
    equality. (Lossy content is covered by unit tests against an
    independent quantized-reconstruction reference —
    ``tests/test_jpeg_codec.py``.)

    ``mode`` selects which pipeline tier sits under the gate (each a
    registry query with its own closed-form oracle):

    - ``"gray"`` — 16×16 single-component, tile value
      ``2·((id·7 + i·5 + j·3) mod 128)``.
    - ``"color"`` — 16×16 4:4:4 YCbCr, gray-content tiles
      ``2·((id·11 + i·3 + j·9) mod 128)``: gray pixels convert to
      Y=v, Cb=Cr=128 with zero rounding (the RGB↔YCbCr coefficients
      sum to 1/0), so the interleaved MCUs, chroma quantization
      table, three DC prediction chains, and both color transforms
      are closed-form-attestable — decoded pixel sum = ``3·64·Σ v``.
    - ``"420"`` — 32×32 (a 2×2 grid of MCUs, 16 tiles) 4:2:0: the
      subsampled geometry — four Y blocks per MCU on one DC chain,
      box-averaged chroma (exact for the constant-128 chroma of gray
      content), replication upsampling — under the same closed form.

    True color content cannot round-trip exactly through
    quantization; it is pinned against the independent references in
    the unit tests.

    Scale: per-asset parallel, zero shuffle — the same mapInPandas
    posture as every codec here; entropy coding is serial per image
    by format design, so assets ARE the parallelism unit."""
    import numpy as np

    from data_warehouse_migration_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_color,
        encode_jpeg_gray,
    )

    if mode not in ("gray", "color", "420"):
        raise ValueError(f"unknown mode {mode!r}")
    tiles = 4 if mode == "420" else 2

    def tile_value(aid: int, i: int, j: int) -> int:
        if mode == "gray":
            return 2 * ((aid * 7 + i * 5 + j * 3) % 128)
        if mode == "color":
            return 2 * ((aid * 11 + i * 3 + j * 9) % 128)
        return 2 * ((aid * 13 + i * 7 + j * 5) % 128)

    def per_id(aid: int) -> tuple[int, int, int]:
        img = np.zeros((8 * tiles, 8 * tiles), dtype=np.uint8)
        for i in range(tiles):
            for j in range(tiles):
                img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = tile_value(
                    aid, i, j
                )
        if mode == "gray":
            payload = encode_jpeg_gray(img)
        else:
            payload = encode_jpeg_color(
                np.repeat(img[:, :, None], 3, axis=2),
                subsample="420" if mode == "420" else "444",
            )
        dec = decode_jpeg(payload)
        return int(dec.shape[1]), int(dec.shape[0]), int(dec.astype("int64").sum())

    return _codec_roundtrip_features(ids_df, id_col, per_id)


def jpeg_progressive_roundtrip_features(
    ids_df: DataFrame, id_col: str = "asset_id"
) -> DataFrame:
    """PROGRESSIVE (SOF2) JPEG encode→bytes→decode under the gate
    harness (r11, VERDICT r10 action #3): per id, a 16×16 grayscale
    image of four solid 8×8 tiles (value ``2·((id·17 + i·11 + j·7)
    mod 128)``) is encoded with the six-scan cjpeg-shaped script —
    DC first with a held-back approximation bit, split AC bands at
    Al=2, AC refinement 2→1 and 1→0, DC refinement — and decoded by
    the full Annex-G progressive decoder (spectral selection,
    successive approximation, EOB runs).

    The closed form is the same arithmetic as the baseline gate: a
    solid even-valued 8×8 block is DC-only with DC divisible by the
    luminance quantizer, and successive approximation is EXACT for
    such coefficients (shift down, shift back up, refinement bits
    restore the rest), so decode(encode(img)) == img bit-for-bit and
    the decoded pixel sum equals 64·Σ v — DuckDB recomputes it with
    no codec anywhere. Defects in any scan kind, the EOB-run
    bookkeeping, or the scan-script plumbing break the equality;
    lossy/real-world progressive content is pinned against
    independent-encoder files in tests/test_jpeg_codec.py.

    A SEPARATE function from jpeg_roundtrip_features on purpose: the
    three baseline gates' attestation standing depends on their code
    path staying untouched (ROTATION.md changed-code rule).

    Scale: per-asset parallel mapInPandas, zero shuffle — same
    posture as every codec gate."""
    import numpy as np

    from data_warehouse_migration_spark.functions.jpeg import (
        decode_jpeg_progressive,
        encode_jpeg_progressive_gray,
        is_progressive_jpeg,
    )

    def per_id(aid: int) -> tuple[int, int, int]:
        img = np.zeros((16, 16), dtype=np.uint8)
        for i in range(2):
            for j in range(2):
                img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = 2 * (
                    (aid * 17 + i * 11 + j * 7) % 128
                )
        payload = encode_jpeg_progressive_gray(img)
        if not is_progressive_jpeg(payload):
            raise ValueError("encoder did not produce an SOF2 stream")
        dec = decode_jpeg_progressive(payload)
        return int(dec.shape[1]), int(dec.shape[0]), int(dec.astype("int64").sum())

    return _codec_roundtrip_features(ids_df, id_col, per_id)


def gif_roundtrip_features(ids_df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """REAL GIF encode→bytes→decode, value-attestable end to end (the
    LZW rung of the codec ladder): per id, a deterministic 16×16
    16-color paletted image — index ``(y, x) = (id + 3y + 5x) mod
    16``, palette channel ``c`` of entry ``i`` =
    ``(id·(c+2) + i·31 + c·11) mod 256`` — is encoded to a full GIF89a
    stream (real dictionary-building variable-width LZW, sub-block
    framing, INTERLACED for odd ids, local color table for ids
    divisible by 3) and decoded back by the general decoder
    (functions/gif), all inside one Arrow-batched ``mapInPandas``;
    the output is the DECODED 3-channel pixel sum.

    Exactness: GIF is LOSSLESS for paletted content, so
    decode(encode) == palette[indices] for every image and the pixel
    sum equals the closed form DuckDB recomputes from the two
    generator formulas. Any defect in the LZW width-bump convention,
    the sub-block framing, the color-table selection, or the 4-pass
    deinterlace breaks the equality. The LZW codec's generality
    beyond this fixture (KwKwK streams, 12-bit cap resets, a
    hand-derived bitstream) is pinned in tests/test_gif_codec.py.

    Scale: per-asset parallel, zero shuffle — LZW is serial per image
    by format design, the same posture as the JPEG/PNG gates."""
    import numpy as np

    from data_warehouse_migration_spark.functions.gif import (
        decode_gif,
        encode_gif,
    )

    H = W = 16

    def per_id(aid: int) -> tuple[int, int, int]:
        y = np.arange(H).reshape(H, 1)
        x = np.arange(W).reshape(1, W)
        idx = ((aid + 3 * y + 5 * x) % 16).astype(np.uint8)
        i = np.arange(16).reshape(16, 1)
        c = np.arange(3).reshape(1, 3)
        pal = ((aid * (c + 2) + i * 31 + c * 11) % 256).astype(np.uint8)
        payload = encode_gif(
            idx, pal, interlace=(aid % 2 == 1), local_table=(aid % 3 == 0)
        )
        dec = decode_gif(payload)
        return int(dec.shape[1]), int(dec.shape[0]), int(dec.astype("int64").sum())

    return _codec_roundtrip_features(ids_df, id_col, per_id)


def tiff_roundtrip_features(ids_df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """REAL TIFF encode→bytes→decode, value-attestable end to end —
    the scanned-document/archival rung of the codec ladder
    (functions/tiff — r12): per id a deterministic 10×16 8-bit image
    — gray pixel ``(y, x) = (id·3 + y·7 + x·11) mod 256`` — is written
    into a full baseline TIFF container (II for even ids / MM for odd:
    both byte orders; Compression rotating none/PackBits/LZW on id
    mod 3 — the LZW being the SAME table-driven EarlyChange variant
    the PDF filter decodes; multi-strip RowsPerStrip=4 for ids ≡ 0
    mod 5, single-strip otherwise) and decoded back by the general
    decoder (IFD grammar, strip walk, per-strip decompression), all
    inside one Arrow-batched ``mapInPandas``; the output is the
    DECODED pixel sum.

    Ids ≡ 3 mod 7 route through the PALETTE leg instead: 8-bit
    indices ``(id + y·3 + x·5) mod 256`` under the closed-form
    ColorMap ``pal[i][c] = (id·3 + i·17 + c·29) mod 256`` (stored as
    the spec's 16-bit channels, recovered via the high byte), so the
    3-channel decoded sum stays a pure formula.

    Exactness: every leg is LOSSLESS (PackBits and LZW are entropy/
    run coders; the container stores samples verbatim), so
    decode(encode(img)) == img for EVERY image with no submanifold
    trick and the decoded pixel sum equals the closed form DuckDB
    recomputes from the generator formulas. A defect in either byte
    order's IFD layout, the strip geometry checks, the PackBits run
    grammar, the LZW width schedule, or the ColorMap scaling breaks
    the equality. Real-world interop (the CPython-shipped RGBA file
    pinned against a test-local independent strip walk) and the
    Predictor-2 path live in tests/test_tiff.py.

    Scale: per-asset parallel, zero shuffle — the codec-gate posture."""
    import numpy as np

    from data_warehouse_migration_spark.functions.tiff import (
        decode_tiff,
        encode_tiff,
    )

    H, W = 10, 16
    _COMP = ("none", "packbits", "lzw")

    def per_id(aid: int) -> tuple[int, int, int]:
        y = np.arange(H).reshape(H, 1)
        x = np.arange(W).reshape(1, W)
        comp = _COMP[aid % 3]
        big_endian = aid % 2 == 1
        rps = 4 if aid % 5 == 0 else None
        if aid % 7 == 3:
            idx = ((aid + y * 3 + x * 5) % 256).astype(np.uint8)
            i = np.arange(256).reshape(256, 1)
            pal = (
                (aid * 3 + i * 17 + np.arange(3).reshape(1, 3) * 29) % 256
            ).astype(np.uint8)
            blob = encode_tiff(
                idx, comp, big_endian, rows_per_strip=rps, palette=pal
            )
        else:
            img = ((aid * 3 + y * 7 + x * 11) % 256).astype(np.uint8)
            blob = encode_tiff(img, comp, big_endian, rows_per_strip=rps)
        dec = decode_tiff(blob)
        return int(dec.shape[1]), int(dec.shape[0]), int(dec.astype("int64").sum())

    return _codec_roundtrip_features(ids_df, id_col, per_id)


def flac_roundtrip_features(ids_df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """REAL FLAC encode→bytes→decode, value-attestable end to end —
    the compressed-AUDIO rung of the codec ladder (JPEG = Huffman/DCT,
    PNG = deflate, GIF = LZW, FLAC = Rice-coded linear prediction):
    per id, a deterministic 96-sample 2-channel 16-bit PCM signal —
    sample ``(t, c) = ((id·7 + t·13 + c·29) mod 4096) − 2048``, or
    the t-independent constant form for ids ≡ 0 mod 5 — is encoded to
    a full FLAC stream (functions/flac: STREAMINFO + audio MD5, frame
    CRC-8/CRC-16, Rice-coded subframes) and decoded back by the
    general decoder, all inside one Arrow-batched ``mapInPandas``;
    the output is the DECODED interleaved sample sum.

    All five encoder legs rotate through the gate on ``id mod 5``:
    CONSTANT subframes (0), VERBATIM (1), FIXED with 4-way Rice
    partitions (2), FIXED under MID/SIDE stereo decorrelation (3),
    and quantized-coefficient LPC (4). FLAC is LOSSLESS for every
    leg — including LPC, whose quantized prediction is exact integer
    arithmetic shared by encoder and decoder — so decode(encode(x))
    == x for EVERY signal with no submanifold trick, and the decoded
    sample sum equals the closed form DuckDB recomputes from the
    generator formula. Any defect in the frame header codes, either
    CRC, the zigzag/Rice coding, the partition sample-count rule,
    the fixed/LPC predictor arithmetic, or the mid/side
    reconstruction breaks the equality. Decode paths our encoder
    never emits (RICE2, the escape partition, wasted bits) are
    pinned by hand-derived bitstreams in tests/test_flac_codec.py.

    Scale: per-asset parallel, zero shuffle — a FLAC stream is serial
    by format design, the same posture as the image codec gates."""
    import numpy as np

    from data_warehouse_migration_spark.functions.flac import (
        decode_flac,
        encode_flac,
    )

    N, RATE = 96, 8000

    def per_id(aid: int) -> tuple[int, int, int, int]:
        t = np.arange(N).reshape(N, 1)
        c = np.arange(2).reshape(1, 2)
        if aid % 5 == 0:
            sig = np.broadcast_to(
                (aid * 7 + c * 29) % 4096 - 2048, (N, 2)
            ).astype(np.int64)
        else:
            sig = ((aid * 7 + t * 13 + c * 29) % 4096 - 2048).astype(np.int64)
        leg = aid % 5
        payload = encode_flac(
            sig,
            RATE,
            16,
            block_size=N,
            strategy={0: "auto", 1: "verbatim", 2: "fixed", 3: "fixed", 4: "lpc"}[leg],
            stereo="mid_side" if leg == 3 else "independent",
            partition_order=2 if leg == 2 else 0,
        )
        dec, rate, _ = decode_flac(payload)
        return int(dec.shape[0]), int(dec.shape[1]), rate, int(dec.sum())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(int(a), *per_id(int(a))) for a in pdf[id_col]]
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_samples", "n_channels", "sample_rate", "sample_sum",
                ],
            )

    return ids_df.mapInPandas(
        run,
        schema=(
            f"{id_col} bigint, n_samples int, n_channels int,"
            " sample_rate int, sample_sum bigint"
        ),
    )


def video_frame_sample_features(
    ids_df: DataFrame, id_col: str = "asset_id", every_n: int = 2
) -> DataFrame:
    """REAL video frame-sampling, value-attestable end to end — the
    briefed multimodal frame-sample op on an actual container format
    instead of a synthetic timestamp plan: per id, a 16×16 grayscale
    MJPEG AVI with ``4 + id mod 5`` frames (frame ``f``'s four 8×8
    tiles hold ``2·((id·7 + f·17 + i·5 + j·3) mod 128)``) is built by
    ``functions/avi.encode_avi_mjpeg`` around real
    ``encode_jpeg_gray`` frames, then FRAME-SAMPLED (every
    ``every_n``-th frame, via one container parse with the idx1 index
    cross-checked against the movi layout) and each sampled frame
    DECODED by the attested JPEG rung — all inside one Arrow-batched
    ``mapInPandas``. Output: container metadata plus the decoded
    pixel sum over the SAMPLED frames only.

    Exactness: the tile values are even and solid (DC-only blocks
    that quantize exactly — the jpeg_roundtrip_features closed form),
    so every sampled frame decodes bit-exactly and the pixel sum
    equals the generator's closed form over frames 0, n, 2n…, which
    DuckDB recomputes with no codec or container anywhere. Any defect
    in the RIFF walk, the avih/strh geometry, the movi chunk
    extraction, the idx1 verification, or the sampling stride breaks
    the equality.

    Scale: one video asset = one row; frames fan out WITHIN the
    Python batch (per-asset parallel, zero shuffle). The sampling
    PLAN for timestamp-based policies stays JVM-side
    (frame_sample_plan); this operator is the decode stage that
    consumes such plans."""
    import numpy as np

    from data_warehouse_migration_spark.functions.avi import (
        encode_avi_mjpeg,
        sample_frames,
    )
    from data_warehouse_migration_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg_gray,
    )

    def per_id(aid: int) -> tuple[int, int, int, int, int]:
        n_frames = 4 + aid % 5
        frames = []
        for f in range(n_frames):
            img = np.zeros((16, 16), dtype=np.uint8)
            for i in range(2):
                for j in range(2):
                    img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = (
                        2 * ((aid * 7 + f * 17 + i * 5 + j * 3) % 128)
                    )
            frames.append(encode_jpeg_gray(img))
        payload = encode_avi_mjpeg(frames, 16, 16, fps=10)
        meta, sampled = sample_frames(payload, every_n=every_n)
        pixel_sum = sum(
            int(decode_jpeg(s).astype("int64").sum()) for s in sampled
        )
        return meta["n_frames"], len(sampled), meta["width"], meta["height"], pixel_sum

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(int(a), *per_id(int(a))) for a in pdf[id_col]]
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "n_frames", "n_sampled", "width", "height", "pixel_sum",
                ],
            )

    return ids_df.mapInPandas(
        run,
        schema=(
            f"{id_col} bigint, n_frames int, n_sampled int,"
            " width int, height int, pixel_sum bigint"
        ),
    )


def audio_container_roundtrip_features(
    ids_df: DataFrame, id_col: str = "asset_id"
) -> DataFrame:
    """REAL audio-container interop, value-attestable end to end —
    the AU/AIFF/WAV tier next to the FLAC rung (functions/pcm_audio):
    per id a 64-sample 2-channel 16-bit signal whose values are
    µ-LAW CODEBOOK POINTS — sample ``(t, c)`` expands code
    ``(id·7 + t·13 + c·29) mod 256`` through the published G.711
    formula — is encoded into the container selected by ``id mod 3``
    (AU / AIFF / WAV... WAV via AU is covered by cross-container unit
    pins, so the rotation here is AU pcm16 / AIFF pcm16 / AU µ-LAW)
    and decoded back, all inside one Arrow-batched ``mapInPandas``.

    The companded leg is the reason for the codebook trick: µ-law is
    lossy in general, but codebook points are FIXPOINTS of
    expand∘compress (up to the published two-zeros identification,
    which expansion maps back to the same VALUE), so the decoded
    samples equal the generated ones exactly on every leg and DuckDB
    recomputes the sample sum from the expansion formula — plain
    integer arithmetic (complement, mask, shift, bias), no codec
    anywhere. Any defect in the AU/AIFF headers, the 80-bit extended
    sample rate, big-endian PCM packing, or either companding
    direction breaks the equality. Real-file pins (CPython's pluck
    corpus across all four containers + stdlib ``wave`` equality)
    live in tests/test_pcm_audio.py.

    Scale: per-asset parallel, zero shuffle — same posture as every
    codec gate."""
    import numpy as np

    from data_warehouse_migration_spark.functions.pcm_audio import (
        decode_aiff,
        decode_au,
        encode_aiff,
        encode_au,
        ulaw_to_linear,
    )

    N, RATE = 64, 8000

    def per_id(aid: int) -> tuple[str, int, int, int, int]:
        t = np.arange(N).reshape(N, 1)
        c = np.arange(2).reshape(1, 2)
        codes = ((aid * 7 + t * 13 + c * 29) % 256).astype(np.uint8)
        sig = ulaw_to_linear(codes).astype(np.int64)
        leg = aid % 3
        if leg == 0:
            dec, rate, _ = decode_au(encode_au(sig, RATE, "pcm16"))
            path = "au-pcm16"
        elif leg == 1:
            dec, rate, _ = decode_aiff(encode_aiff(sig, RATE, 16))
            path = "aiff-pcm16"
        else:
            dec, rate, _ = decode_au(encode_au(sig, RATE, "ulaw"))
            path = "au-ulaw"
        return path, int(dec.shape[0]), int(dec.shape[1]), rate, int(dec.sum())

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(int(a), *per_id(int(a))) for a in pdf[id_col]]
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "path", "n_samples", "n_channels",
                    "sample_rate", "sample_sum",
                ],
            )

    return ids_df.mapInPandas(
        run,
        schema=(
            f"{id_col} bigint, path string, n_samples int, n_channels int,"
            " sample_rate int, sample_sum bigint"
        ),
    )


def jpeg_exif_orientation_features(
    ids_df: DataFrame, id_col: str = "asset_id"
) -> DataFrame:
    """EXIF orientation end to end (functions/exif — r11): per id a
    NON-SQUARE 16×24 grayscale six-tile JPEG (tile (i,j) value =
    ``2·((id·5 + i·7 + j·11) mod 128)``, the DC-only closed form) is
    encoded, an APP1/EXIF segment with orientation ``1 + id mod 8``
    is inserted (TIFF byte order II for even ids, MM for odd — both
    parsers exercised), and the pipeline then does what a production
    image loader does: decode (the codec walks past APP1), parse the
    orientation tag, auto-rotate to the upright raster.

    Exactness: the decoded raster is bit-exact (even solid tiles),
    rotation/flip is a permutation — so the pixel SUM is invariant
    while the displayed width/height SWAP exactly for orientations
    5-8; both are closed forms DuckDB recomputes. A defect in the
    marker walk, either TIFF byte order, the IFD entry layout, or
    any of the eight dispositions breaks the equality."""
    import numpy as np

    from data_warehouse_migration_spark.functions.exif import (
        apply_orientation,
        build_exif_app1,
        insert_app1,
        parse_exif_orientation,
    )
    from data_warehouse_migration_spark.functions.jpeg import (
        decode_jpeg_auto,
        encode_jpeg_gray,
    )

    def per_id(aid: int) -> tuple[int, int, int, int]:
        img = np.zeros((24, 16), dtype=np.uint8)
        for i in range(3):
            for j in range(2):
                img[i * 8 : (i + 1) * 8, j * 8 : (j + 1) * 8] = (
                    2 * ((aid * 5 + i * 7 + j * 11) % 128)
                )
        orientation = 1 + aid % 8
        payload = insert_app1(
            encode_jpeg_gray(img),
            build_exif_app1(orientation, little_endian=(aid % 2 == 0)),
        )
        got = parse_exif_orientation(payload)
        upright = apply_orientation(decode_jpeg_auto(payload), got)
        return (
            int(got),
            int(upright.shape[1]),
            int(upright.shape[0]),
            int(upright.astype("int64").sum()),
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [(int(a), *per_id(int(a))) for a in pdf[id_col]]
            yield pd.DataFrame(
                rows,
                columns=[id_col, "orientation", "width", "height", "pixel_sum"],
            )

    return ids_df.mapInPandas(
        run,
        schema=(
            f"{id_col} bigint, orientation int, width int, height int,"
            " pixel_sum bigint"
        ),
    )


def png_roundtrip_features(ids_df: DataFrame, id_col: str = "asset_id") -> DataFrame:
    """REAL PNG encode→bytes→decode, value-attestable end to end
    (VERDICT r9 action #5): per id, a deterministic 16×10 RGB image —
    pixel ``(y, x, c) = (id·3 + y·7 + x·11 + c·29) mod 256`` — is
    encoded to a full PNG container (functions/png: chunk grammar +
    CRC-32, zlib wrapper + Adler-32, per-row filters CYCLING through
    all five types 0-4, stored-deflate for even ids and fixed-Huffman
    deflate for odd ids) and decoded back by the general decoder (own
    inflate, filter inversion), all inside one Arrow-batched
    ``mapInPandas``; the output is the DECODED pixel sum.

    Exactness: PNG is LOSSLESS — filters are mod-256 integer
    arithmetic and deflate is entropy-only — so decode(encode(img))
    == img for EVERY image with no submanifold trick (unlike the JPEG
    gates), and the decoded pixel sum equals the closed form DuckDB
    recomputes from the generator formula. Any defect in chunk/CRC
    parsing, either deflate block type, the Adler check, or any of
    the five filter inverses breaks the equality. Ids divisible by 3
    additionally route through the COLOR-TYPE-3 path (the generator's
    pixel color is a function of one byte, so ≤ 256 distinct colors
    always): indices + PLTE encode, index unfiltering, palette-lookup
    decode — same closed form, since the lookup reproduces the RGB
    exactly. The inflate's generality beyond this encoder (dynamic
    Huffman + LZ77 back-references) is pinned in
    tests/test_png_codec.py against real ``zlib.compress`` output as
    an independent reference. Ids ≡ 3 mod 7 route through the
    SUB-BYTE leg (r11): 4/2/1-bit palette indices (depth by id mod
    3), MSB-first packing, filters over packed bytes, its own
    closed-form palette — real-world 2/4-bit icons are pinned against
    an independent test-local decoder in tests/test_png_codec.py.

    Scale: per-asset parallel, zero shuffle — the same mapInPandas
    posture as the other codec gates."""
    import numpy as np

    from data_warehouse_migration_spark.functions.png import (
        decode_png,
        encode_png,
    )

    H, W = 10, 16

    def per_id(aid: int) -> tuple[int, int, int]:
        y = np.arange(H).reshape(H, 1, 1)
        x = np.arange(W).reshape(1, W, 1)
        c = np.arange(3).reshape(1, 1, 3)
        img = ((aid * 3 + y * 7 + x * 11 + c * 29) % 256).astype(np.uint8)
        # all three deflate encoders rotate through the gate: stored
        # (even ids), literals-only fixed (ids ≡ 1 mod 4), and the
        # real LZ77 + learned-codes dynamic encoder (ids ≡ 3 mod 4);
        # ids ≡ 0 mod 5 additionally transmit INTERLACED (Adam7, all
        # seven passes filtered independently) — lossless either way,
        # so the closed form is unchanged.
        deflate = (
            "stored" if aid % 2 == 0 else ("fixed" if aid % 4 == 1 else "dynamic")
        )
        interlace = aid % 5 == 0
        if aid % 7 == 3:
            # SUB-BYTE leg (r11, VERDICT r10 action #5): 4/2/1-bit
            # palette indices (depth rotating on aid mod 3), MSB-first
            # packing, filters over the PACKED bytes, partial trailing
            # bytes per Adam7 pass row. The palette is its own closed
            # form — pal[i][c] = (aid·3 + i·17 + c·29) mod 256 with
            # idx = (aid + y·3 + x·5) mod 2^d — so the decoded RGB sum
            # stays DuckDB-recomputable with no codec anywhere.
            d = {0: 4, 1: 2, 2: 1}[aid % 3]
            m = 1 << d
            idx = ((aid + y[:, :, 0] * 3 + x[:, :, 0] * 5) % m).astype(
                np.uint8
            )
            i = np.arange(m).reshape(m, 1)
            pal = (
                (aid * 3 + i * 17 + np.arange(3).reshape(1, 3) * 29) % 256
            ).astype(np.uint8)
            payload = encode_png(
                idx, deflate, "cycle", palette=pal,
                interlace=interlace, bit_depth=d,
            )
            dec = decode_png(payload)
            return (
                int(dec.shape[1]),
                int(dec.shape[0]),
                int(dec.astype("int64").sum()),
            )
        if aid % 3 == 0:
            # color-type-3 leg: pixel color is a function of
            # s = (aid*3 + y*7 + x*11) mod 256, so the palette is the
            # ≤256 distinct s values; lookup decode reproduces the
            # identical RGB.
            s = img[:, :, 0]
            uniq = np.unique(s)
            idx = np.searchsorted(uniq, s).astype(np.uint8)
            pal = np.stack(
                [uniq, (uniq + 29) % 256, (uniq + 58) % 256], axis=1
            ).astype(np.uint8)
            payload = encode_png(
                idx, deflate, "cycle", palette=pal, interlace=interlace
            )
        else:
            payload = encode_png(
                img, deflate, filter_mode="cycle", interlace=interlace
            )
        dec = decode_png(payload)
        return int(dec.shape[1]), int(dec.shape[0]), int(dec.astype("int64").sum())

    return _codec_roundtrip_features(ids_df, id_col, per_id)
