"""Property tests for the sketch family: for ARBITRARY inputs and
arbitrary batch splits, (a) HDR histograms are split-invariant (merge
of partials ≡ one-shot) and their quantile readouts match a pure-
Python reference of the same spec, and (b) count-min never
under-estimates. Fixed-case versions live in test_sketches.py /
test_histogram_sketch.py; these generalize them.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SB = 16

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from data_warehouse_migration_spark.session import get_spark

        _spark = get_spark("sketch-prop")
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _py_bucket(v: int) -> tuple[int, int]:
    e = v.bit_length() - 1
    return e, (v * SB) // (1 << e) - SB


def _py_quantile(vals: list[int], q: float) -> float:
    from collections import Counter

    hist = Counter(_py_bucket(v) for v in vals)
    n = len(vals)
    q_num = round(q * 10_000)
    rank = (q_num * n + 9999) // 10_000
    cum = 0
    for (e, sub) in sorted(hist):
        cum += hist[(e, sub)]
        if cum >= rank:
            return round((SB + sub) * (1 << e) / SB / 1.0, 6)
    raise AssertionError("unreachable")


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    vals=st.lists(st.integers(min_value=1, max_value=10**7), min_size=3, max_size=60),
    cut=st.integers(min_value=1, max_value=59),
    q=st.sampled_from([0.5, 0.95, 0.99]),
)
def test_hdr_split_invariance_and_reference(vals, cut, q):
    from data_warehouse_migration_spark.operators.histogram_sketch import (
        hdr_histogram,
        hdr_quantiles,
        merge_histograms,
    )

    spark = _get_spark()
    cut = min(cut, len(vals) - 1)

    def df(rows):
        return spark.createDataFrame([("g", v) for v in rows], ["g", "cents"])

    merged = merge_histograms(
        hdr_histogram(df(vals[:cut]), ["g"], "cents"),
        hdr_histogram(df(vals[cut:]), ["g"], "cents"),
    )
    direct = hdr_histogram(df(vals), ["g"], "cents")
    assert sorted(merged.collect()) == sorted(direct.collect())

    row = hdr_quantiles(merged, ["g"], qs=(q,), scale=1).collect()[0]
    est = getattr(row, f"p{str(q)[2:].ljust(2, '0')}_est")
    assert est == _py_quantile(vals, q)


@settings(
    max_examples=6, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    counts=st.lists(st.integers(min_value=1, max_value=50), min_size=1, max_size=40)
)
def test_cms_overestimates_arbitrary_inputs(counts):
    from pyspark.sql import functions as F

    from data_warehouse_migration_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
    )

    spark = _get_spark()
    wc = spark.createDataFrame(
        [(f"t{i}", c) for i, c in enumerate(counts)], ["tok", "c"]
    )
    counters = cms_counters(wc, "tok", "c", depth=3, width=8)  # heavy collisions
    est = cms_estimate(wc, counters, "tok", depth=3, width=8)
    assert est.filter(F.col("cms_est") < F.col("c")).count() == 0
