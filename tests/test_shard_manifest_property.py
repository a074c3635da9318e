"""Property-based test of the chunk-chained shard manifest
(operators/sharding.shard_manifest_chunked) against a pure-Python
reference: for arbitrary doc sets, chunk sizes, and shard counts, the
two-level checksum must equal the reference computed from first
principles (md5 order key → shard assignment → rank → chunk split →
level-1/level-2 chains) — covering ragged final chunks, single-row
shards, empty shards (absent rows), and chunk_rows ≥ shard size
(single-chunk collapse)."""

from __future__ import annotations

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_warehouse_migration_spark.operators.sharding import (
    shard_manifest_chunked,
)

_texts = st.sampled_from(["alpha", "beta beta", "gamma delta", "x"])
_docs = st.lists(
    _texts, min_size=1, max_size=24
)  # doc_id = list index (unique)
_chunks = st.sampled_from([1, 2, 5, 100])
_shards = st.sampled_from([1, 3])

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from data_warehouse_migration_spark.session import get_spark

        _spark = get_spark("manifest-property")
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _reference(texts, n_shards, salt, chunk_rows):
    rows = []
    for doc_id, text in enumerate(texts):
        k = _md5(f"{salt}{doc_id}")
        shard = int(k[:4], 16) % n_shards
        rows.append((shard, k, doc_id, _md5(text)))
    out = {}
    for shard in {r[0] for r in rows}:
        ordered = sorted(
            [r for r in rows if r[0] == shard], key=lambda r: (r[1], r[2])
        )
        chunks = [
            ordered[i : i + chunk_rows]
            for i in range(0, len(ordered), chunk_rows)
        ]
        level1 = [_md5("".join(r[3] for r in ch)) for ch in chunks]
        out[shard] = {
            "n_docs": len(ordered),
            "n_chunks": len(chunks),
            "shard_checksum": _md5("".join(level1)),
            "first_key": ordered[0][1],
            "last_key": ordered[-1][1],
        }
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(texts=_docs, chunk_rows=_chunks, n_shards=_shards)
def test_chunked_manifest_matches_reference(texts, chunk_rows, n_shards):
    spark = _get_spark()
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )
    got = {
        r["shard_id"]: r
        for r in shard_manifest_chunked(
            docs, n_shards, salt="p", chunk_rows=chunk_rows
        ).collect()
    }
    want = _reference(texts, n_shards, "p", chunk_rows)
    assert set(got) == set(want)
    for sid, w in want.items():
        g = got[sid]
        for field in ("n_docs", "n_chunks", "shard_checksum", "first_key", "last_key"):
            assert g[field] == w[field], (sid, field)
