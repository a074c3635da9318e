"""Temporal joins: point-in-time (interval) join and as-of join.

The reference implements PIT attribution as a broadcast equi-join
followed by a range filter (``DF_Load_FactSales.json:112-120``;
canonical spec ``sql_scripts/fact_sales.sql:11-13`` —
``OrderDate >= ValidFrom AND OrderDate < ISNULL(ValidTo,'9999-12-31')``).
Spark-first improvement (SURVEY.md §2.3 J3): a single join whose
condition carries both the equi key and the range predicates. Catalyst
extracts the equi part for hashing and applies the range as a residual
filter inside the join — no post-join blow-up materialized.

100 TB posture: dimension sides of PIT joins are version tables (small
relative to facts) → broadcast by default. When the dim itself is huge,
the same call with ``broadcast_dim=False`` yields a sort-merge join on
the equi key with the interval residual; for extreme version counts per
key, pre-bucket both sides on the key (``df.write.bucketBy``) so the
join is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OPEN_ENDED_SENTINEL = "9999-12-31"


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    ts: str,
    valid_from: str = "ValidFrom",
    valid_to: str = "ValidTo",
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Attribute each fact row to the dim *version* valid at its event time.

    Join condition: ``facts[on] == dim[on] AND facts[ts] >= dim[valid_from]
    AND facts[ts] < coalesce(dim[valid_to], '9999-12-31')`` — half-open
    interval, NULL ``valid_to`` = current version (reference semantics,
    ``fact_sales.sql:11-13``). Dim columns keep their names; the join
    keys are emitted once (from the fact side).
    """
    keys = [on] if isinstance(on, str) else list(on)
    f = facts.alias("__f")
    d = (F.broadcast(dim) if broadcast_dim else dim).alias("__d")

    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__f.{k}") == F.col(f"__d.{k}"))
    sentinel = F.lit(OPEN_ENDED_SENTINEL).cast(dict(dim.dtypes)[valid_from])
    cond = (
        cond
        & (F.col(f"__f.{ts}") >= F.col(f"__d.{valid_from}"))
        & (F.col(f"__f.{ts}") < F.coalesce(F.col(f"__d.{valid_to}"), sentinel))
    )

    dim_cols = [c for c in dim.columns if c not in keys]
    return f.join(d, cond, how).select(
        *[F.col(f"__f.{c}") for c in facts.columns],
        *[F.col(f"__d.{c}") for c in dim_cols],
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    tolerance: str | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """For each left row, the latest right row with ``right_ts <= left_ts``
    (per key) — the classic time-series as-of join the reference lacks
    but a 100 TB pipeline needs (market data, feature stores).

    Implementation: range join + ``row_number() == 1`` over
    ``(left row, right_ts DESC)``. The window partitions by the left
    row's identity, so each left row keeps at most one match. With
    ``tolerance`` (an INTERVAL string, e.g. ``'7 days'``), matches older
    than ``left_ts - tolerance`` are dropped. ``right_tiebreak`` names
    right-side columns that break equal-``right_ts`` ties (ascending) —
    pass a unique key to make the result total/deterministic.

    At scale prefer bucketing both sides by key; the interval condition
    stays a residual on a co-partitioned sort-merge join.
    """
    from pyspark.sql import Window

    keys = [on] if isinstance(on, str) else list(on)
    # Unique per-row id so the keep-latest window partitions by ROW, not
    # by value — two fully identical left rows each keep their own match
    # (a value-partitioned window would silently collapse them).
    l = left.withColumn("__row_id", F.monotonically_increasing_id()).alias("__l")  # noqa: E741
    r = right.alias("__r")

    cond: Column = F.lit(True)
    for k in keys:
        cond = cond & (F.col(f"__l.{k}") == F.col(f"__r.{k}"))
    cond = cond & (F.col(f"__r.{right_ts}") <= F.col(f"__l.{left_ts}"))
    if tolerance is not None:
        cond = cond & (
            F.col(f"__r.{right_ts}")
            >= F.col(f"__l.{left_ts}") - F.expr(f"INTERVAL {tolerance}")
        )

    value_cols = right_value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    joined = l.join(r, cond, "left")
    order = [F.col(f"__r.{right_ts}").desc_nulls_last()] + [
        F.col(f"__r.{c}").asc() for c in (right_tiebreak or [])
    ]
    w = Window.partitionBy(F.col("__l.__row_id")).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            *[F.col(f"__l.{c}") for c in left.columns],
            *[F.col(f"__r.{c}") for c in value_cols],
        )
    )


def as_of_join_merge_scan(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str] | None = None,
    tolerance: str | None = None,
    right_tiebreak: list[str] | None = None,
) -> DataFrame:
    """:func:`as_of_join` semantics via ONE merge scan — the fact×fact
    formulation for when BOTH sides are large (quotes⋈trades, feature
    log ⋈ training events).

    Why not the join+window form at that scale: its range join
    materializes EVERY earlier right row per left row before the
    window keeps one — O(left × preceding-rights-per-key) intermediate,
    quadratic per key for long histories. Here neither side ever joins:
    both are tagged and UNIONED, one hash shuffle co-locates each key,
    and a single ordered window carries the latest right row forward
    (``last(…, ignorenulls=True)`` over rows-unbounded-preceding) onto
    each left row — cost is sort + linear scan, intermediate ≡ input.

    Ordering makes the inclusive bound and determinism exact: rows
    sort by (ts, side) with right rows FIRST at equal timestamps (so a
    same-instant right row IS visible, matching ``right_ts <=
    left_ts``), and equal-``right_ts`` right rows sort by
    ``right_tiebreak`` DESCENDING so the carried (last) one is the
    tiebreak-ascending winner — the same row the join+window form
    keeps. ``tolerance`` (INTERVAL string) nulls out carried matches
    older than ``left_ts - tolerance`` after the carry (the carry
    itself stays O(1) per row).

    Returns the left rows + matched right value columns (null where no
    match). Verified equal to :func:`as_of_join` in
    ``tests/test_joins.py``; at 100 TB pre-bucket both sides on the
    key to delete the one shuffle.
    """
    from pyspark.sql import Window

    keys = [on] if isinstance(on, str) else list(on)
    value_cols = right_value_cols or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    tiebreak = list(right_tiebreak or [])

    rv = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__tb_{i}") for i, c in enumerate(tiebreak)],
        rv.alias("__rv"),
    )
    l_tagged = left.select(
        *left.columns,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # Tiebreaks sort DESCENDING (nulls first, so left rows — whose
    # __tb_* are null — keep their (__t, __side) position): among
    # right rows sharing __t, the LAST row in this order is the
    # tiebreak-ASCENDING winner, which is what the carry keeps.
    order = [F.col("__t").asc(), F.col("__side").asc()] + [
        F.col(f"__tb_{i}").desc_nulls_first() for i in range(len(tiebreak))
    ]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__rv", ignorenulls=True).over(w)
    # Carry BEFORE dropping the right rows — the window must see them.
    out = u.withColumn("__m", carried).filter(F.col("__side") == 1)
    match = F.col("__m")
    if tolerance is not None:
        in_tol = match["__rts"] >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
        match = F.when(in_tol, F.col("__m"))
        out = out.withColumn("__m", match)
    return out.select(
        *left.columns,
        *[F.col("__m")[c].alias(c) for c in value_cols],
    )


def _floor_div(a: Column, b: int) -> Column:
    """Exact floor(a/b) for non-negative longs — all-integer via the
    pmod identity (a double division can land one bucket off once a/b
    nears an integer within the quotient's half-ulp)."""
    bl = F.lit(b)
    return ((a - F.pmod(a, bl)) / bl).cast("long")


def range_join_by_bucket(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_s: int,
    upper_s: int,
    on: str | list[str] | None = None,
    n_salts: int = 1,
) -> DataFrame:
    """INNER range join ``right_ts ∈ [left_ts + lower_s, left_ts +
    upper_s]`` (seconds, inclusive both ends, negative = before) as an
    EQUI join on time buckets — the formulation that survives having
    NO selective equi key.

    Why: a pure time-range condition gives Catalyst nothing to hash
    on — the plan degenerates to BroadcastNestedLoopJoin (the exact
    scale-killer ``tools/plan_audit.py`` hard-fails). Bucketing width
    ``W = upper_s - lower_s`` makes it hashable: each left row's
    window spans at most TWO W-buckets, so the left side replicates
    ≤2× (explode over ``sequence(b_lo, b_hi)``), the right side maps
    to its single bucket, and the join is a plain shuffle-hash/SMJ on
    (``on`` keys +) bucket with the range as residual — candidates
    per row are bounded by the rows inside a 2W slice of time, linear
    for any stationary arrival rate. Bucket arithmetic is exact
    integer µs (``_floor_div``). This is the public range-join
    optimization shape (Databricks range-join hints, Flink interval
    joins); Spark OSS has no native rule, so it lives here as an
    operator.

    Outer semantics: compose — aggregate this INNER result and
    re-join onto ``left`` (replicated left copies make a direct
    left-outer emit spurious unmatched duplicates). Output: all left
    columns + all right columns (name-collision-free inputs).

    ``n_salts > 1`` splits every bucket into that many sub-buckets for
    HOT time windows (a flash crowd packs one W-slice with rows, and
    one task inherits the whole bucket): the right side salts by a
    content-addressed hash of its WHOLE row (``pmod(xxhash64(*cols),
    n_salts)`` — no ``rand()``, retries reproduce it; hashing only the
    timestamp would send a flash crowd sharing one second-resolution
    ts into a single salt, leaving the skew intact while the left
    still pays full replication — review finding), the left side
    replicates across all salts (×``n_salts`` on the already-≤2×
    replicated probe side). Results are provably identical — salting
    only refines the partitioning key.
    """
    if upper_s <= lower_s:
        raise ValueError("upper_s must exceed lower_s")
    w_us = (upper_s - lower_s) * 1_000_000
    keys = [on] if isinstance(on, str) else list(on or [])

    l_us = F.unix_micros(F.col(left_ts).cast("timestamp"))
    r_us = F.unix_micros(F.col(right_ts).cast("timestamp"))
    lo_us = F.lit(lower_s * 1_000_000).cast("long")
    hi_us = F.lit(upper_s * 1_000_000).cast("long")

    l_exp = left.withColumn(
        "__b",
        F.explode(
            F.sequence(
                _floor_div(l_us + lo_us, w_us), _floor_div(l_us + hi_us, w_us)
            )
        ),
    )
    r_b = right.withColumn("__b", _floor_div(r_us, w_us))
    if n_salts > 1:
        l_exp = l_exp.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
        )
        r_b = r_b.withColumn(
            "__salt",
            F.pmod(
                F.xxhash64(*[F.col(c) for c in right.columns]),
                F.lit(n_salts),
            ).cast("int"),
        )

    cond: Column = l_exp["__b"] == r_b["__b"]
    if n_salts > 1:
        cond = cond & (l_exp["__salt"] == r_b["__salt"])
    for k in keys:
        cond = cond & (l_exp[k] == r_b[k])
    l_ts_col = l_exp[left_ts].cast("timestamp")
    r_ts_col = r_b[right_ts].cast("timestamp")
    l_us_j = F.unix_micros(l_ts_col)
    r_us_j = F.unix_micros(r_ts_col)
    cond = cond & (r_us_j >= l_us_j + lo_us) & (r_us_j <= l_us_j + hi_us)

    right_cols = [c for c in right.columns if c not in keys]
    return l_exp.join(r_b, cond).select(
        *[l_exp[c] for c in left.columns],
        *[r_b[c] for c in right_cols],
    )
