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

The codec itself is STUBBED (media libraries are not in this
container): ``decode_stub=True`` produces deterministic fake features
(byte-length, a rolling checksum, fake dims); installing a real codec
replaces ONE function (``_decode_batch``) — schema, batching, and
plumbing stay identical, which is what the tests pin down.
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


def _decode_batch(pdf: pd.DataFrame, decode_stub: bool) -> pd.DataFrame:
    """Decode one Arrow batch of assets → features.

    REAL path (not available in this container): replace the stub
    branch with e.g. PIL/librosa/av calls over ``payload`` bytes.
    """
    if not decode_stub:
        raise NotImplementedError(
            "real media codecs are not installed in this environment; "
            "run with decode_stub=True or install a codec and replace "
            "_decode_batch's real branch"
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
