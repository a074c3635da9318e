"""Property test for containment_pairs (operators/dedup.py): for
arbitrary small corpora over a tiny vocabulary (forcing heavy shingle
sharing), the prefix-filtered plan must emit EXACTLY the pairs a
brute-force Python reference computes — recall (nothing the exact
integer prefix bound should keep is lost, the float-formula bug class)
and precision (verification filters every false candidate).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_migration_spark.operators.dedup import containment_pairs

N = 2  # shingle width — small so short docs still share
_W = ["ax", "bx", "cx", "dx"]

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from data_warehouse_migration_spark.session import get_spark

        _spark = get_spark("containment-prop")
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _shingles(words: list[str]) -> set[str]:
    if len(words) < N:
        return {" ".join(words)}
    return {" ".join(words[i : i + N]) for i in range(len(words) - N + 1)}


def _reference(docs: list[list[str]], t: float):
    out = {}
    sh = {i: _shingles(w) for i, w in enumerate(docs)}
    for a in sh:
        for b in sh:
            if a == b:
                continue
            c = round(len(sh[a] & sh[b]) / len(sh[a]), 6)
            if c >= t:
                out[(a, b)] = c
    return out


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_W), min_size=1, max_size=8),
        min_size=2,
        max_size=7,
    ),
    threshold=st.sampled_from([0.6, 0.75, 0.9, 1.0]),
)
def test_containment_matches_bruteforce(docs, threshold):
    spark = _get_spark()
    df = spark.createDataFrame(
        [(i, " ".join(w)) for i, w in enumerate(docs)], ["doc_id", "text"]
    )
    got = {
        (r.contained_id, r.container_id): r.containment
        for r in containment_pairs(df, n=N, threshold=threshold).collect()
    }
    assert got == _reference(docs, threshold)
