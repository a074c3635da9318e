"""Segmented EWMA: bounded-memory fold must match the direct recurrence."""

import math

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.recurrence import segmented_ewma


def _direct_ewma(values, alpha):
    e = values[0]
    for x in values[1:]:
        e = alpha * x + (1 - alpha) * e
    return e


def test_segmented_ewma_hot_key_matches_direct_fold(spark):
    """One hot user with 5000 events (>> seg_len) alongside tiny users:
    the stitched result must equal the sequential recurrence, and the
    segment size must actually bound what any one fold sees."""
    rows = [(1, i, float((i * 37) % 101) / 7.0) for i in range(5000)]
    rows += [(2, 0, 10.0)]                      # single-event user: ewma = x_1
    rows += [(3, i, float(i)) for i in range(3)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")

    out = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in segmented_ewma(
            df, "user_id", ["event_id"], "value", alpha=0.3, seg_len=64
        ).collect()
    }
    vals1 = [v for _, i, v in sorted(rows[:5000], key=lambda t: t[1])]
    assert out[1][0] == 5000
    assert math.isclose(out[1][1], _direct_ewma(vals1, 0.3), rel_tol=0, abs_tol=1e-9)
    assert out[2] == (1, 10.0)
    assert math.isclose(out[3][1], _direct_ewma([0.0, 1.0, 2.0], 0.3), abs_tol=1e-12)


def test_segmented_ewma_invariant_to_seg_len(spark):
    """seg_len is a memory knob, not a semantics knob."""
    rows = [(1, i, math.sin(i) * 100) for i in range(500)]
    df = spark.createDataFrame(rows, "user_id int, event_id int, value double")
    results = []
    for seg_len in (1, 7, 64, 1000):
        r = segmented_ewma(
            df, "user_id", ["event_id"], "value", alpha=0.3, seg_len=seg_len
        ).collect()[0]
        results.append(r.ewma_value)
    for v in results[1:]:
        assert math.isclose(v, results[0], rel_tol=0, abs_tol=1e-9)


def test_segmented_ewma_no_full_series_collect(spark):
    """The plan's first aggregate must group on (key, segment) — the
    full-series-per-key collect_list is exactly what this avoids."""
    df = spark.createDataFrame(
        [(1, i, float(i)) for i in range(100)],
        "user_id int, event_id int, value double",
    )
    plan = (
        segmented_ewma(df, "user_id", ["event_id"], "value", 0.3, seg_len=10)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "__seg" in plan
