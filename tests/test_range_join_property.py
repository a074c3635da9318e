"""Property-based test of the bucketed range join
(operators/joins.range_join_by_bucket) against a pure-Python
reference: tiny integer-second domains force rows onto exact bucket
boundaries and exact interval endpoints — the cases where an
off-by-one in the floor-division bucket math or an exclusive bound
would diverge. Both keyless and keyed forms, one- and two-sided
windows."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_migration_spark.operators.joins import (
    range_join_by_bucket,
)

_T0 = dt.datetime(2024, 1, 1)

_keys = st.integers(min_value=0, max_value=1)
_ts = st.integers(min_value=0, max_value=12)

_rows = st.lists(st.tuples(_keys, _ts), min_size=0, max_size=6)
_windows = st.sampled_from([(-3, 0), (-3, 3), (0, 2), (2, 5)])

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from data_warehouse_migration_spark.session import get_spark

        _spark = get_spark("rangejoin-property")
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lrows=_rows, rrows=_rows, window=_windows, keyed=st.booleans())
def test_bucketed_range_join_matches_reference(lrows, rrows, window, keyed):
    if not lrows:
        return
    lo, hi = window
    spark = _get_spark()
    left = spark.createDataFrame(
        [
            (i, k, _T0 + dt.timedelta(seconds=s))
            for i, (k, s) in enumerate(lrows)
        ],
        "lid int, k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (i, k, _T0 + dt.timedelta(seconds=s))
            for i, (k, s) in enumerate(rrows)
        ],
        "rid int, k2 int, rts timestamp",
    )
    if keyed:
        right = right.withColumnRenamed("k2", "k")
    got = {
        (r["lid"], r["rid"])
        for r in range_join_by_bucket(
            left,
            right,
            left_ts="lts",
            right_ts="rts",
            lower_s=lo,
            upper_s=hi,
            on="k" if keyed else None,
        ).collect()
    }
    expected = {
        (li, ri)
        for li, (lk, ls) in enumerate(lrows)
        for ri, (rk, rs) in enumerate(rrows)
        if (not keyed or lk == rk) and ls + lo <= rs <= ls + hi
    }
    assert got == expected
