"""Data-quality routing: good/quarantine split with reasons."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.quality import (
    split_quarantine,
    with_violations,
)


def test_split_quarantine_routes_and_labels(spark):
    df = spark.createDataFrame(
        [(1, 5, "ok"), (2, -1, "neg qty"), (3, 5, None), (4, 0, "zero")],
        "id int, qty int, note string",
    )
    rules = {
        "qty_positive": F.col("qty") > 0,
        "note_present": F.col("note").isNotNull(),
    }
    good, bad = split_quarantine(df, rules)
    assert {r.id for r in good.collect()} == {1}
    reasons = {r.id: set(r.violations) for r in bad.collect()}
    assert reasons == {
        2: {"qty_positive"},
        3: {"note_present"},
        4: {"qty_positive"},  # qty=0 fails the strict > 0 rule
    }


def test_null_rule_input_counts_as_violation(spark):
    df = spark.createDataFrame([(1, None)], "id int, qty int")
    out = with_violations(df, {"qty_positive": F.col("qty") > 0})
    assert out.collect()[0].violations == ["qty_positive"]


def test_table_profile_counts_nulls_types_and_ranges(spark):
    from data_warehouse_migration_spark.operators.profile import table_profile

    df = spark.createDataFrame(
        [(1, "a", 2.0, None), (2, None, None, None), (2, "b", 8.5, None)],
        "k int, s string, v double, ts timestamp",
    )
    prof = {r.col_name: r for r in table_profile(df).collect()}
    assert prof["k"].n_rows == 3 and prof["k"].n_nulls == 0
    assert prof["k"].n_distinct == 2
    assert (prof["k"].min_num, prof["k"].max_num) == (1.0, 2.0)
    assert prof["s"].n_nulls == 1 and prof["s"].n_distinct == 2
    assert (prof["s"].min_str, prof["s"].max_str) == ("a", "b")
    assert prof["s"].min_num is None
    assert prof["v"].n_nulls == 1 and (prof["v"].min_num, prof["v"].max_num) == (2.0, 8.5)
    assert prof["ts"].n_nulls == 3 and prof["ts"].n_distinct == 0
    assert prof["ts"].min_num is None and prof["ts"].min_str is None

    # approx twin: same shape, distincts within HLL tolerance
    approx = {r.col_name: r for r in table_profile(df, approx=True).collect()}
    assert set(approx) == set(prof)
    assert abs(approx["k"].n_distinct - 2) <= 1


def test_best_copy_selection_prefers_longest_then_lowest_id(spark):
    """dedup_exact_best_copy's selection branch on constructed
    duplicates (the gate corpus has no exact dups, so the discriminator
    only fires here): longest normalized copy wins its digest group;
    doc_id breaks length ties; n_copies reports group size."""
    from data_warehouse_migration_spark.catalog import REGISTRY
    import tempfile, shutil, os

    base = tempfile.mkdtemp(prefix="bestcopy_")
    try:
        docs = spark.createDataFrame(
            [
                (1, "en", "same text"),
                (2, "en", "same  text"),   # normalizes identically; same length
                (3, "en", "unique content here"),
            ],
            ["doc_id", "lang", "text"],
        )
        docs.write.parquet(f"{base}/documents.parquet")
        out = {
            r.doc_id: r
            for r in REGISTRY["dedup_exact_best_copy"].spark_fn(spark, base).collect()
        }
        # group {1,2}: equal normalized length → lowest id (1) survives
        assert set(out) == {1, 3}
        assert out[1].n_copies == 2 and out[3].n_copies == 1
    finally:
        shutil.rmtree(base, ignore_errors=True)
