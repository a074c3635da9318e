"""Property test for the overlapping token chunker
(queries/quality_ops.chunk_documents_overlap): for arbitrary documents,
chunks must tile the token stream exactly — every token covered, chunk
starts on the fixed stride, consecutive chunks share exactly the
overlap, and dropping each chunk's leading overlap reconstructs the
original token sequence."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

CHUNK, OVERLAP, STRIDE = 32, 8, 24

_W = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from data_warehouse_migration_spark.session import get_spark

        _spark = get_spark("chunk-prop")
        _spark.sparkContext.setLogLevel("ERROR")
    return _spark


def _expected_chunks(words: list[str]) -> list[list[str]]:
    last_start = max(len(words) - OVERLAP, 1)
    return [
        words[s - 1 : s - 1 + CHUNK] for s in range(1, last_start + 1, STRIDE)
    ]


@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_W), min_size=1, max_size=90),
        min_size=1,
        max_size=5,
    )
)
def test_chunker_tiles_and_reconstructs(docs, tmp_path_factory):
    spark = _get_spark()
    from data_warehouse_migration_spark.queries.quality_ops import (
        chunk_documents_overlap,
    )

    sf_dir = tmp_path_factory.mktemp("chunkprop")
    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    spark.createDataFrame(rows, "doc_id bigint, text string").withColumn(
        "lang", F.lit("en")
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    got = chunk_documents_overlap(spark, str(sf_dir)).collect()
    by_doc: dict[int, list] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)

    import hashlib

    for doc_id, words in enumerate(docs):
        expected = _expected_chunks(words)
        chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in chunks] == list(range(len(expected)))
        for r, exp in zip(chunks, expected):
            assert r.n_tokens == len(exp)
            assert r.chunk_hash == hashlib.md5(" ".join(exp).encode()).hexdigest()
        # reconstruction: chunk 0 whole, later chunks minus the overlap
        rebuilt: list[str] = []
        for i, exp in enumerate(expected):
            rebuilt.extend(exp if i == 0 else exp[OVERLAP:])
        assert rebuilt == words, "chunks must tile the token stream exactly"
