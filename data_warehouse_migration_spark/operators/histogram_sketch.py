"""HDR-style log2 quantile histogram — mergeable approximate
percentiles with EXACT integer bucketing (Tene's HdrHistogram /
DDSketch family: exponent bucket + linear sub-buckets per octave,
giving a bounded RELATIVE error of 1/subbuckets).

Why next to `percentile_approx`: Spark's GK sketch answers one-shot
quantile queries but is not a first-class mergeable TABLE — you
cannot store per-day/per-partition partials and fold them later
without re-scanning. This histogram is just ``(group, bucket, cnt)``
rows: partials merge by ``union → groupBy → sum`` with ZERO accuracy
loss (the merge is exact, unlike GK/t-digest whose merged error
compounds), serve from a driver-tiny table, and attest exactly —
every bucket index is integer arithmetic (binary-string length for
floor-log2, ``div`` for the sub-bucket), so any engine reproduces the
sketch bit-for-bit. The readout (lower-bound representative of the
first bucket whose cumulative count reaches ⌈q·n⌉) is deterministic
too.

Error bound: within octave e, buckets are 2^e/subbuckets wide, so the
lower-bound estimate is below the true quantile by < 1/subbuckets
relative (6.25% at the default 16) — the HdrHistogram "significant
digits" contract.

Scale: the sketch build is one map-side-combined shuffle to ≤
(octaves × subbuckets) rows per group (~1k rows for the full int64
range); the readout windows run on that bounded table. Values must be
NON-NEGATIVE integers (scale money/durations to cents/micros first —
the repo's standard exact-integer representation). Zero gets a
dedicated bucket (e=0, sub=−subbuckets, representative exactly 0 —
both engines compute it identically from the 1-char binary string),
matching HdrHistogram's own explicit zero-count cell. Negative
values RAISE at scan time: Spark's ``div`` truncates toward zero
while DuckDB's ``//`` floors, so a negative input would silently
desynchronize the two engines' buckets (ADVICE r6) — out-of-domain
input fails loudly instead of mis-bucketing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def hdr_histogram(
    df: DataFrame,
    group_cols: list[str],
    cents_col: str,
    subbuckets: int = 16,
) -> DataFrame:
    """Bucket counts ``(group..., e, sub, cnt)`` over non-negative
    integer values: ``e = floor(log2 v)`` (binary-string length —
    exact), ``sub = (v·subbuckets div 2^e) − subbuckets`` ∈
    [0, subbuckets); v=0 lands in the dedicated zero bucket
    (e=0, sub=−subbuckets). Negative values raise (see module doc).
    """
    sb = subbuckets
    log_sb = sb.bit_length() - 1
    if 1 << log_sb != sb:
        raise ValueError("subbuckets must be a power of two")
    # Domain guard: negatives diverge between engines (Spark div
    # truncates, DuckDB // floors) — raise per-row rather than emit a
    # silently-desynchronized bucket. CASE evaluates only the taken
    # branch, so valid rows never touch raise_error.
    e = F.when(
        F.col(cents_col) >= 0,
        (F.length(F.conv(F.col(cents_col), 10, 2)) - 1).cast("int"),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    "hdr_histogram: negative value in column "
                    f"'{cents_col}' — domain is non-negative integer "
                    "cents/micros, got "
                ),
                F.col(cents_col).cast("string"),
            )
        ).cast("int")
    )
    # v·sb div 2^e, computed WITHOUT the multiply for e ≥ log2(sb):
    # v·sb overflows long at v ≥ 2^(63−log2 sb), well inside the
    # advertised int64 domain; v div 2^(e−log2 sb) is the identical
    # quotient (sb = 2^log2 sb exactly) and never overflows. The
    # multiply form survives only for the tiny v < sb octaves.
    rows = df.withColumn("e", e).withColumn(
        "sub",
        F.expr(
            f"CASE WHEN e >= {log_sb}"
            f" THEN ({cents_col} div shiftleft(1L, e - {log_sb})) - {sb}"
            f" ELSE (({cents_col} * {sb}) div shiftleft(1L, e)) - {sb} END"
        ).cast("int"),
    )
    return rows.groupBy(*group_cols, "e", "sub").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def merge_histograms(*hists: DataFrame) -> DataFrame:
    """Exact fold of partial sketches — union + re-sum. Sum of
    histograms IS the histogram of the union (integer cells), so
    per-day/per-cluster partials lose nothing."""
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    keys = [c for c in out.columns if c != "cnt"]
    return out.groupBy(*keys).agg(F.sum("cnt").alias("cnt"))


def hdr_quantiles(
    hist: DataFrame,
    group_cols: list[str],
    qs: tuple[float, ...] = (0.5, 0.95, 0.99),
    subbuckets: int = 16,
    scale: int = 100,
) -> DataFrame:
    """Per-group quantile estimates from the sketch: for each q, the
    lower-bound representative of the first bucket whose cumulative
    count reaches ⌈q·n⌉, descaled to original units and rounded to 6.

    ``lo_scaled = (subbuckets + sub)·2^e`` keeps the representative in
    integers until the single final division — the cross-engine rule
    (exact for values below 2^(63−log2(2·subbuckets)), i.e. the whole
    money-cents domain). The rank cut ⌈q·n⌉ is integer arithmetic with
    q rationalized over 1e4 — ``ceil(0.99·n)`` through a double reads
    one rank high whenever 0.99·n is an exact integer the product
    computes a hair above.
    """
    sb = subbuckets
    w_cum = Window.partitionBy(*group_cols).orderBy("e", "sub")
    w_all = Window.partitionBy(*group_cols)
    ranked = (
        hist.withColumn("cum", F.sum("cnt").over(w_cum))
        .withColumn("total", F.sum("cnt").over(w_all))
        .withColumn("lo_scaled", F.expr(f"({sb} + sub) * shiftleft(1L, e)"))
    )
    aggs = [F.max("total").cast("long").alias("n_values")]
    for q in qs:
        q_num = round(q * 10_000)
        rank_cut = F.expr(f"({q_num}L * total + 9999L) div 10000L")
        est = F.min(F.when(F.col("cum") >= rank_cut, F.col("lo_scaled")))
        aggs.append(
            F.round(est / float(sb) / float(scale), 6).alias(
                f"p{str(q)[2:].ljust(2, '0')}_est"
            )
        )
    return ranked.groupBy(*group_cols).agg(*aggs)
