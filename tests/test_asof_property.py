"""Property-based test of the merge-scan as-of join
(operators/joins.as_of_join_merge_scan) against a pure-Python
reference: for arbitrary key/timestamp mixes — including EQUAL
left/right timestamps and equal-right-timestamp ties, which real
event data rarely exercises — every left row must match the latest
right row with right_ts <= left_ts (same key), ties broken by the
SMALLEST tiebreak id, tolerance nulling matches older than
left_ts - tol. Duplicate left rows each keep their own match."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_migration_spark.operators.joins import (
    as_of_join_merge_scan,
)

_T0 = dt.datetime(2024, 1, 1)

# Small domains force collisions: 2 keys, 6 timestamps → equal-ts ties
# and same-instant left/right pairs are frequent.
_keys = st.integers(min_value=0, max_value=1)
_ts = st.integers(min_value=0, max_value=5)

_left_rows = st.lists(
    st.tuples(_keys, _ts), min_size=1, max_size=6
)
_right_rows = st.lists(
    st.tuples(_keys, _ts), min_size=0, max_size=6
)

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from data_warehouse_migration_spark.session import get_spark

        _spark = get_spark("asof-property")
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _expected(lrows, rrows, tol_s):
    out = []
    for li, (lk, lt) in enumerate(lrows):
        cands = [
            (rt, rid)
            for rid, (rk, rt) in enumerate(rrows)
            if rk == lk and rt <= lt
        ]
        if not cands:
            out.append((li, None))
            continue
        best_t = max(rt for rt, _ in cands)
        best_id = min(rid for rt, rid in cands if rt == best_t)
        if tol_s is not None and best_t < lt - tol_s:
            out.append((li, None))
        else:
            out.append((li, best_id))
    return dict(out)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(lrows=_left_rows, rrows=_right_rows, use_tol=st.booleans())
def test_merge_scan_asof_matches_reference(lrows, rrows, use_tol):
    spark = _get_spark()
    tol_s = 2 if use_tol else None

    left = spark.createDataFrame(
        [
            (li, lk, _T0 + dt.timedelta(seconds=lt))
            for li, (lk, lt) in enumerate(lrows)
        ],
        "lid int, k int, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            (rid, rk, _T0 + dt.timedelta(seconds=rt))
            for rid, (rk, rt) in enumerate(rrows)
        ],
        "rid int, k int, rts timestamp",
    )
    got = {
        r["lid"]: r["rid"]
        for r in as_of_join_merge_scan(
            left,
            right,
            on="k",
            left_ts="lts",
            right_ts="rts",
            right_value_cols=["rid"],
            tolerance=f"{tol_s} seconds" if tol_s is not None else None,
            right_tiebreak=["rid"],
        ).collect()
    }
    assert got == _expected(lrows, rrows, tol_s)
