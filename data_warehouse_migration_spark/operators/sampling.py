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

from pyspark.sql import Column, DataFrame
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
