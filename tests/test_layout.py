"""Z-order layout (operators/layout.py): Morton codes vs a Python
reference, and the actual data-skipping property — files written by
``write_zordered`` must have tight min/max ranges in BOTH dimensions,
where a one-column sort is tight in one and spans the other."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.layout import (
    morton_code,
    write_zordered,
)

BITS = 12


def _ref_morton(x: int, y: int, bits: int = BITS) -> int:
    x &= (1 << bits) - 1
    y &= (1 << bits) - 1
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_matches_reference(spark):
    rows = [(x, y) for x in (0, 1, 5, 4095, 4096, 123456) for y in (0, 3, 77, 4095)]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = df.select(
        "x", "y", morton_code(F.col("x"), F.col("y"), BITS).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _ref_morton(r["x"], r["y"]), (r["x"], r["y"])


def _file_spans(spark, path, col):
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        row = (
            spark.read.parquet(f)
            .agg(F.min(col).alias("lo"), F.max(col).alias("hi"))
            .first()
        )
        if row["lo"] is not None:
            spans.append(row["hi"] - row["lo"])
    return spans


def test_zorder_write_prunes_both_dims(spark, sf_dir, tmp_path):
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_orderkey"),
            F.col("o_custkey").cast("long").alias("x"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
            .cast("long")
            .alias("y"),
        )
    )
    stats = o.agg(
        (F.max("x") - F.min("x")).alias("sx"),
        (F.max("y") - F.min("y")).alias("sy"),
        F.count("*").alias("n"),
    ).first()
    zpath = str(tmp_path / "zorder")
    write_zordered(o, zpath, "x", "y", bits=BITS, n_files=8)

    back = spark.read.parquet(zpath)
    assert back.count() == stats["n"]

    # Data-skipping property: per-file ranges are tight in BOTH
    # dimensions at once. A single-column sort makes one dimension
    # tight and leaves the other ≈ the global span (span-fraction
    # product ≈ 1.0 per file); z-ordering into k files shrinks the
    # covered AREA toward 1/k. Per-dim bounds are looser (the
    # interleave trades each dim's tightness for the product).
    x_spans = _file_spans(spark, zpath, "x")
    y_spans = _file_spans(spark, zpath, "y")
    assert len(x_spans) >= 4
    assert sum(x_spans) / len(x_spans) < 0.75 * stats["sx"]
    assert sum(y_spans) / len(y_spans) < 0.75 * stats["sy"]
    areas = [xs * ys for xs, ys in zip(x_spans, y_spans)]
    area_frac = (sum(areas) / len(areas)) / (stats["sx"] * stats["sy"])
    assert area_frac < 0.35, area_frac


def test_quantize_dim_exact_on_wide_spans(spark):
    """quantize_dim must agree with exact integer `//` even when the
    span approaches 2^41 — the regime where a double floor(a/b) can
    land one grid cell off (ADVICE r5). All-integer path, no floats."""
    from data_warehouse_migration_spark.operators.layout import quantize_dim

    lo, hi = 0, (1 << 41) - 7
    span = hi - lo + 1
    bits = 12
    # Values straddling grid-cell boundaries, where a half-ulp error flips
    # the cell: c = ceil(k*span/2^bits) - 1 and its successor, across k.
    cases = []
    for k in (1, 7, 1025, 4095):
        edge = -((-k * span) // (1 << bits))  # ceil
        cases += [edge - 1, edge, edge + 1]
    cases = [c for c in cases if lo <= c <= hi]
    df = spark.createDataFrame([(c,) for c in cases], ["c"])
    got = {
        r["c"]: r["q"]
        for r in df.select(
            "c",
            quantize_dim(F.col("c"), F.lit(lo), F.lit(hi), bits).alias("q"),
        ).collect()
    }
    for c in cases:
        assert got[c] == ((c - lo) * (1 << bits)) // span, c


def test_morton_n_matches_reference_and_2d_compat(spark):
    """morton_code_n: matches a pure-Python interleave for 3 dims, and
    with 2 dims is bit-identical to the original morton_code (so the
    attested zorder oracle arithmetic is unchanged)."""
    from data_warehouse_migration_spark.operators.layout import (
        morton_code,
        morton_code_n,
        morton_sql_n,
    )

    def py_morton(vals, bits):
        z = 0
        d = len(vals)
        for j, v in enumerate(vals):
            v &= (1 << bits) - 1
            for i in range(bits):
                z |= ((v >> i) & 1) << (d * i + j)
        return z

    rows = [(3, 5, 9), (0, 0, 0), (1023, 1, 512), (7, 7, 7)]
    df = spark.createDataFrame(rows, ["a", "b", "c"])
    got = df.select(
        morton_code_n([F.col("a"), F.col("b"), F.col("c")], bits=10).alias("z3"),
        morton_code_n([F.col("a"), F.col("b")], bits=10).alias("z2n"),
        morton_code(F.col("a"), F.col("b"), bits=10).alias("z2"),
    ).collect()
    for (a, b, c), r in zip(rows, got):
        assert r["z3"] == py_morton([a, b, c], 10), (a, b, c)
        assert r["z2n"] == r["z2"]

    # SQL twin agrees with the Column twin (DuckDB evaluation).
    import duckdb

    expr = morton_sql_n(["a", "b", "c"], bits=10)
    con = duckdb.connect()
    for (a, b, c), r in zip(rows, got):
        val = con.sql(
            f"SELECT {expr} AS z FROM (SELECT {a} AS a, {b} AS b, {c} AS c)"
        ).fetchone()[0]
        assert val == r["z3"]


def test_zorder_n_three_column_write_prunes_all_dims(spark, sf_dir, tmp_path):
    """write_zordered_n over three orders dimensions: per-file VOLUME
    (product of per-dim span fractions) shrinks well below 1 — every
    dimension's file stats stay useful for skipping."""
    from data_warehouse_migration_spark.operators.layout import (
        write_zordered_n,
    )

    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            F.col("o_custkey").cast("long").alias("x"),
            F.datediff(F.col("o_orderdate"), F.lit("1992-01-01"))
            .cast("long")
            .alias("y"),
            (F.round(F.col("o_totalprice")).cast("long")).alias("w"),
        )
    )
    stats = o.agg(
        (F.max("x") - F.min("x")).alias("sx"),
        (F.max("y") - F.min("y")).alias("sy"),
        (F.max("w") - F.min("w")).alias("sw"),
        F.count("*").alias("n"),
    ).first()
    zpath = str(tmp_path / "z3")
    write_zordered_n(o, zpath, ["x", "y", "w"], n_files=8)
    back = spark.read.parquet(zpath)
    assert back.count() == stats["n"]

    spans = {c: _file_spans(spark, zpath, c) for c in ("x", "y", "w")}
    n_files = len(spans["x"])
    assert n_files >= 4
    vol = 0.0
    for i in range(n_files):
        vol += (
            (spans["x"][i] / stats["sx"])
            * (spans["y"][i] / stats["sy"])
            * (spans["w"][i] / stats["sw"])
        )
    assert vol / n_files < 0.45, vol / n_files


def test_widen_narrow_input_widens_and_preserves_rows(spark, sf_dir):
    from data_warehouse_migration_spark.operators.layout import (
        widen_narrow_input,
    )

    import pytest

    target = spark.sparkContext.defaultParallelism
    if target == 1:
        # The widen is a guarded no-op when the session has one core
        # (nothing is narrower than parallelism 1) — there is no
        # behavior to observe here (ADVICE r15 #3).
        pytest.skip("widen is a no-op on a 1-core session")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert docs.rdd.getNumPartitions() == 1  # the fixture shape the helper exists for
    wide = widen_narrow_input(docs)
    assert wide.rdd.getNumPartitions() == target
    # Pure redistribution: same rows, nothing dropped or duplicated.
    assert sorted(r.doc_id for r in wide.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )


def test_widen_narrow_input_noop_when_already_wide(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(0, 1000).repartition(target + 3)
    out = widen_narrow_input_ref(df)
    # Already wider than the core count: the frame passes through
    # UNTOUCHED (same plan object), so production-scale scans never
    # pay an extra exchange.
    assert out is df


def widen_narrow_input_ref(df):
    from data_warehouse_migration_spark.operators.layout import (
        widen_narrow_input,
    )

    return widen_narrow_input(df)
