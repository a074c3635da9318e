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
