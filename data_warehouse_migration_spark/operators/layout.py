"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping — the lakehouse `OPTIMIZE ZORDER BY` shape as plain
DataFrame ops.

Why it matters at 100 TB: min/max file statistics prune scans only
when a file's value RANGE is tight for the filtered column. A sort on
one column gives perfect pruning for that column and none for any
other; interleaving the bits of two (or more) quantized dimensions
into one sort key gives every file a tight range in BOTH dimensions —
point/range predicates on either column skip most files.

Pieces:
- :func:`morton_code` — pure Column bit-interleave, whole-stage
  codegen, no UDFs; identical arithmetic is emitted as SQL by
  :func:`morton_sql` so a DuckDB oracle reproduces codes exactly;
- :func:`write_zordered` — repartitionByRange on the code (range
  partitioner ≈ one contiguous z-range per file) + partition-local
  sort + parquet write: shuffle-once/write-once, same contract as
  ``operators/sharding.write_shuffled_shards``;
- callers quantize dimensions first (rank, scale, or truncate into
  ``[0, 2^bits)``); codes mask inputs to ``bits`` so out-of-domain
  values wrap rather than corrupt the interleave.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_code(x: Column, y: Column, bits: int = 12) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a Z-order (Morton) code: x occupies even bit
    positions, y odd. 2·bits output bits; inputs are masked to
    ``bits`` first."""
    return morton_code_n([x, y], bits)


def morton_code_n(dims: list[Column], bits: int = 12) -> Column:
    """N-dimensional Morton interleave — the general ``OPTIMIZE ZORDER
    BY (c1, …, cn)`` kernel: dimension ``j`` of ``d`` owns output bit
    positions ``j, j+d, j+2d, …``. ``len(dims)·bits`` output bits must
    fit a signed long (≤ 62). Pure Column bit arithmetic, whole-stage
    codegen; :func:`morton_sql_n` emits identical SQL for oracles."""
    d = len(dims)
    if d < 1:
        raise ValueError("need at least one dimension")
    if d * bits > 62:
        raise ValueError(f"{d} dims × {bits} bits exceeds a signed long")
    mask = (1 << bits) - 1
    z = F.lit(0).cast("long")
    for j, c in enumerate(dims):
        ci = c.cast("long").bitwiseAND(F.lit(mask))
        for i in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(ci, i).bitwiseAND(F.lit(1)), d * i + j)
            )
    return z


def widen_narrow_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a NARROW input up to the session's
    default parallelism — and a NO-OP on anything already wide.

    Why: a single-file, single-row-group parquet table plans as ONE
    scan task (a row group is assigned whole to the split holding its
    midpoint — no config can subdivide it), so every pre-exchange
    operator, and the entire probe side of a broadcast-join chain,
    runs on one core. That is the "one huge unsplittable file" input
    skew of the optimization playbook, and the remedy is the same:
    repartition immediately after the read. The sf0.1 fixtures are
    exactly this shape (one ~1-10 MB file per table), which serialized
    the CPU-heavy stages of the vector/dedup queries on 1 of 32 cores.

    Scale posture: the exchange is bought ONLY when the input is
    narrower than the core count — a production 100 TB table scans as
    thousands of splits, so ``getNumPartitions() >= target`` and the
    frame passes through untouched, no extra shuffle. Round-robin
    repartition is deterministic under retry (Spark sorts before
    round-robin distribution — SPARK-23207), and downstream results
    must not depend on partitioning anyway (exact aggregates are
    order-free; FP aggregates in this repo round to absorb
    partition-order noise by contract).

    PRECONDITION — call on SCAN-ADJACENT frames only (ADVICE r15 #2):
    the width probe converts the frame to an RDD, and under AQE that
    conversion FINALIZES the adaptive plan by executing any upstream
    shuffle stages — on a frame with exchanges below it, the probe
    would silently run (and later duplicate) those stages. On a bare
    file scan (every current call site) nothing executes; the probe
    only plans the scan splits.
    """
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def morton_sql(x_expr: str, y_expr: str, bits: int = 12) -> str:
    """The same interleave as :func:`morton_code`, as an ANSI-SQL
    expression string (DuckDB-compatible bit operators) — the oracle
    half of the pair. Inputs are masked to ``bits`` identically."""
    return morton_sql_n([x_expr, y_expr], bits)


def morton_sql_n(dim_exprs: list[str], bits: int = 12) -> str:
    """:func:`morton_code_n` as an ANSI-SQL expression string."""
    d = len(dim_exprs)
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        for j, e in enumerate(dim_exprs):
            terms.append(f"(((({e}) & {mask}) >> {i}) & 1) << {d * i + j}")
    return "(" + " | ".join(f"({t})" for t in terms) + ")"


def quantize_dim(c: Column, lo: Column, hi: Column, bits: int = 12) -> Column:
    """Scale an integer column from ``[lo, hi]`` onto the full
    ``[0, 2^bits)`` grid with EXACT integer arithmetic
    (``(c-lo)·2^bits div (hi-lo+1)``) — the required first step before
    interleaving: raw dimensions with disparate ranges (a 150-value
    key next to a 3500-day range) leave the wider dimension owning all
    the high interleave bits and degenerate z-order into a plain sort
    on it. Integer div keeps the grid reproducible across engines (no
    float rounding)."""
    span = hi - lo + F.lit(1)
    scaled = (c.cast("long") - lo) * F.lit(1 << bits)
    # All-integer quotient: (a - a mod b) is an exact multiple of b, so
    # the one double division is correctly-rounded to the exact integer
    # quotient — no float path for wide spans (a double floor(a/b) can
    # land one grid cell off DuckDB's `//` once 1/span nears the
    # quotient's half-ulp). Inputs are non-negative (c ≥ lo), so pmod
    # matches truncating `%` and the result matches integer `//`.
    return ((scaled - F.pmod(scaled, span)) / span).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    bits: int = 12,
    n_files: int = 8,
    quantize: bool = True,
) -> None:
    """Z-order-clustered parquet write: one range shuffle on the
    Morton code (each output file covers a contiguous z-range ⇒ tight
    min/max in BOTH source dimensions), partition-local sort, one
    write. With ``quantize`` (default) both dimensions are first
    scaled onto the full ``2^bits`` grid from their observed min/max
    (one driver-side 1-row agg — the same range stats any layout
    optimizer records); pass False when callers pre-quantized. The
    ``z_code`` column is kept so readers and maintenance jobs can
    re-cluster incrementally."""
    x, y = F.col(x_col), F.col(y_col)
    if quantize:
        stats = df.agg(
            F.min(x_col).alias("xlo"),
            F.max(x_col).alias("xhi"),
            F.min(y_col).alias("ylo"),
            F.max(y_col).alias("yhi"),
        ).first()
        if any(stats[k] is None for k in ("xlo", "xhi", "ylo", "yhi")):
            raise ValueError(
                "write_zordered: empty input or all-null z-order column — "
                "nothing to cluster"
            )
        span = max(
            int(stats["xhi"]) - int(stats["xlo"]) + 1,
            int(stats["yhi"]) - int(stats["ylo"]) + 1,
        )
        if bits > 62 - span.bit_length():  # quantize_dim (c−lo)·2^bits headroom
            raise ValueError(
                f"write_zordered: bits={bits} overflows for span {span}; "
                f"max safe bits here is {62 - span.bit_length()}"
            )
        x = quantize_dim(x, F.lit(int(stats["xlo"])), F.lit(int(stats["xhi"])), bits)
        y = quantize_dim(y, F.lit(int(stats["ylo"])), F.lit(int(stats["yhi"])), bits)
    coded = df.withColumn("z_code", morton_code(x, y, bits))
    (
        coded.repartitionByRange(n_files, F.col("z_code"))
        .sortWithinPartitions("z_code")
        .write.mode("overwrite")
        .parquet(path)
    )


def write_zordered_n(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int | None = None,
    n_files: int = 8,
) -> None:
    """N-column Z-order-clustered write — ``OPTIMIZE ZORDER BY
    (c1, …, cn)``. Per-dimension bits default to the largest fitting a
    signed long (``62 // n``, e.g. 3 cols → 20 bits each); every
    dimension is quantized onto its full grid from observed min/max
    (one 1-row stats agg), interleaved via :func:`morton_code_n`, then
    one range shuffle + partition-local sort + write. More dimensions
    trade per-dimension resolution for breadth — beyond 3-4 columns
    the per-file ranges loosen enough that Hilbert curves or column
    stats reordering are the published next steps."""
    if not cols:
        raise ValueError("need at least one column")
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    stats = df.agg(*aggs).first()
    spans = {}
    for c in cols:
        lo, hi = stats[f"__lo_{c}"], stats[f"__hi_{c}"]
        if lo is None or hi is None:
            raise ValueError(
                f"write_zordered_n: column {c!r} has no values (empty input "
                "or all-null) — nothing to cluster"
            )
        spans[c] = int(hi) - int(lo) + 1
    # quantize_dim computes (c − lo)·2^bits on longs: bits must leave
    # headroom for the widest span or the product silently wraps (ANSI
    # off) and z-codes are garbage. Cap the default by BOTH the
    # interleave budget (62 // n) and per-dimension span headroom;
    # reject an explicit bits that would overflow.
    span_cap = min(62 - s.bit_length() for s in spans.values())
    if bits is None:
        bits = max(1, min(62 // len(cols), span_cap))
    elif bits > span_cap:
        widest = max(spans, key=spans.get)
        raise ValueError(
            f"write_zordered_n: bits={bits} overflows (column {widest!r} "
            f"spans {spans[widest]}; max safe bits here is {span_cap})"
        )
    dims = [
        quantize_dim(
            F.col(c),
            F.lit(int(stats[f"__lo_{c}"])),
            F.lit(int(stats[f"__hi_{c}"])),
            bits,
        )
        for c in cols
    ]
    coded = df.withColumn("z_code", morton_code_n(dims, bits))
    (
        coded.repartitionByRange(n_files, F.col("z_code"))
        .sortWithinPartitions("z_code")
        .write.mode("overwrite")
        .parquet(path)
    )
