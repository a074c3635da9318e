"""Deterministic sampling / dataset splitting (training-data pipeline).

Random `df.sample` is irreproducible across partitionings — a resize or
repartition reshuffles which rows land where `rand()` draws them. A
100 TB training pipeline needs *content-addressed* sampling: each row's
fate depends only on its key, so splits are stable across runs,
engines, cluster sizes, and data relayouts, and a key never migrates
between train and eval (leakage-proof by construction).

Mechanism: bucket = first 4 hex nibbles of md5(key) → uniform int in
[0, 65536); split thresholds are cumulative fractions of that space.
Zero shuffles — the assignment is a pure projection; engine-portable
(md5), so the DuckDB oracle reproduces assignments bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 65536  # 16^4


def md5_bucket(key: Column) -> Column:
    """Uniform [0, 65536) bucket from the md5 of the key's string form."""
    return F.conv(F.substring(F.md5(key.cast("string")), 1, 4), 16, 10).cast("int")


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, float],
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by hash bucket.

    ``splits``: name → fraction, fractions summing to ~1.0 (the last
    split absorbs rounding residue). Assignment is per-key: duplicate
    keys always co-locate in one split.
    """
    names = list(splits)
    bounds = []
    acc = 0.0
    for name in names[:-1]:
        acc += splits[name]
        bounds.append(int(acc * BUCKETS))

    b = md5_bucket(F.col(key_col))
    expr = F.lit(names[-1])
    for name, bound in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(b < bound, F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def hash_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by key hash — a reproducible
    TABLESAMPLE. Complement of the kept set is exactly the rows a
    second call with (1 - fraction) on the inverted predicate returns.
    """
    return df.filter(md5_bucket(F.col(key_col)) < int(fraction * BUCKETS))


def hash_uniform(key: Column, salt: str = "") -> Column:
    """Deterministic uniform in (0, 1) from md5(salt||key): the first
    48 hash bits, offset half a step (never exactly 0 or 1). Exact in
    double — the content-addressed replacement for ``rand()``."""
    v = F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 12),
        16,
        10,
    ).cast("double")
    return (v + 0.5) / float(1 << 48)


def weighted_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    salt: str = "",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, deterministic: the
    Efraimidis–Spirakis A-ES scheme with content-addressed randomness.
    Each row draws u = :func:`hash_uniform` and competes with key
    ln(u)/weight (the monotone form of u^(1/w)); the global top-k win.
    P(row in sample) increases with weight exactly as A-ES guarantees,
    and the SAME (corpus, salt, k) always selects the same rows — no
    ``rand()``, so retries, resizes, and re-runs agree, and a SQL
    oracle can re-derive the selection bit-for-bit.

    Scale: the score is a zero-shuffle projection; global top-k plans
    as TakeOrderedAndProject (per-partition heads, driver merge of
    k·partitions rows). Weights must be > 0.

    Returns the k selected rows with ``es_key`` and ``sample_rank``
    (rounded/tie-broken so the ordering is engine-stable).
    """
    u = hash_uniform(F.col(key_col), salt)
    es = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    return (
        df.withColumn("es_key", es)
        .orderBy(F.col("es_key").desc(), F.col(key_col))
        .limit(k)
        .withColumn(
            "sample_rank",
            F.row_number().over(
                Window.orderBy(F.col("es_key").desc(), F.col(key_col))
            ),
        )
    )


def weighted_mix(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    keep_fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic weighted dataset mixing: keep a per-stratum
    fraction of rows (e.g. down-sample dominant languages, keep all of
    rare ones) — the content-addressed version of `sampleBy`, stable
    across runs/partitionings/engines like :func:`hash_split`.

    Selection: row kept iff md5-bucket(key) < fraction(stratum)·65536.
    Pure projection+filter — zero shuffles; composes with any
    downstream dedup/tokenize stage.
    """
    b = md5_bucket(F.col(key_col))
    thresh = F.lit(int(default_fraction * BUCKETS))
    for stratum, frac in keep_fractions.items():
        thresh = F.when(
            F.col(stratum_col) == stratum, F.lit(int(frac * BUCKETS))
        ).otherwise(thresh)
    return df.filter(b < thresh)


def budget_sample(
    df: DataFrame,
    stratum_col: str,
    key_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Budget-based stratified draw: per stratum, admit documents in
    content-addressed order (md5 of the key, then the key) until the
    per-stratum SIZE budget is spent — a doc is kept iff the budget was
    not exhausted before it (its exclusive running sum < budget), so
    every stratum lands within one document of the target.

    This is how a multilingual pretraining mix is actually balanced —
    by token/char budget per language, not by document count (docs
    vary 100× in length; count-based draws skew the mix). The
    hash-order makes the draw reproducible across runs, engines, and
    partitionings, and unbiased w.r.t. any corpus ordering.

    Adds ``cum_<size_col>`` (inclusive running total). One shuffle on
    the stratum; per-stratum sort is bounded by stratum size — for
    mega-strata, pre-prune with :func:`hash_sample` to a few× the
    budget first so the sort never sees the full stratum.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.md5(F.col(key_col).cast("string")), F.col(key_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(size_col).over(w)
    return (
        df.withColumn("__cum", cum)
        .filter(F.col("__cum") - F.col(size_col) < budget)
        .withColumnRenamed("__cum", f"cum_{size_col}")
    )


def temperature_weights(
    df: DataFrame,
    stratum_col: str,
    size_col: str,
    alpha: float = 0.3,
) -> DataFrame:
    """Temperature-scaled mixture weights per stratum: p_s ∝ n_s^α —
    the multilingual-pretraining rebalancing rule (α=0.3 in XLM-R,
    Conneau et al. 2020; α=1 is natural proportion, α=0 uniform).
    Low-resource strata are up-weighted relative to their natural
    share; ``boost`` reports exactly that ratio (p_s / natural share,
    >1 = up-sampled).

    Returns one row per stratum: ``(stratum, n_size, weight, boost)``.

    Scale & exactness: one map-side-combined shuffle to the per-stratum
    totals (stratum-count rows — driver-tiny), then a 1-row totals
    broadcast (sanctioned O(n·1) scalar pattern). The α-power weight is
    rounded into scaled 1e6 integers BEFORE the totals sum, so the
    denominator is an order-independent integer sum (the catalog's
    exactness rule — raw double sums are partition-order-dependent);
    the final ratios are IEEE divisions of identical integers on any
    engine, rounded to 6.
    """
    agg = df.groupBy(stratum_col).agg(
        F.sum(size_col).cast("long").alias("n_size")
    )
    w_int = F.round(
        F.pow(F.col("n_size").cast("double"), F.lit(float(alpha))) * 1e6
    ).cast("long")
    weighted = agg.withColumn("w_int", w_int)
    totals = weighted.agg(
        F.sum("w_int").alias("tot_w"), F.sum("n_size").alias("tot_n")
    )
    share = F.col("w_int").cast("double") / F.col("tot_w")
    natural = F.col("n_size").cast("double") / F.col("tot_n")
    return (
        weighted.crossJoin(F.broadcast(totals))
        .select(
            stratum_col,
            "n_size",
            F.round(share, 6).alias("weight"),
            F.round(share / natural, 6).alias("boost"),
        )
    )
