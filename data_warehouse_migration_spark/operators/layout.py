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
    mask = (1 << bits) - 1
    xi = x.cast("long").bitwiseAND(F.lit(mask))
    yi = y.cast("long").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(xi, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(yi, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


def morton_sql(x_expr: str, y_expr: str, bits: int = 12) -> str:
    """The same interleave as :func:`morton_code`, as an ANSI-SQL
    expression string (DuckDB-compatible bit operators) — the oracle
    half of the pair. Inputs are masked to ``bits`` identically."""
    mask = (1 << bits) - 1
    xi = f"(({x_expr}) & {mask})"
    yi = f"(({y_expr}) & {mask})"
    terms = []
    for i in range(bits):
        terms.append(f"((({xi} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({yi} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


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
        x = quantize_dim(x, F.lit(int(stats["xlo"])), F.lit(int(stats["xhi"])), bits)
        y = quantize_dim(y, F.lit(int(stats["ylo"])), F.lit(int(stats["yhi"])), bits)
    coded = df.withColumn("z_code", morton_code(x, y, bits))
    (
        coded.repartitionByRange(n_files, F.col("z_code"))
        .sortWithinPartitions("z_code")
        .write.mode("overwrite")
        .parquet(path)
    )
