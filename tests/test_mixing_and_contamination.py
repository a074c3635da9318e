"""Temperature mixing and graded-contamination invariants
(operators/sampling.temperature_weights,
operators/dedup.contamination_scores). The gate queries value-attest
vs DuckDB; these pin the semantic guarantees on constructed inputs.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.dedup import contamination_scores
from data_warehouse_migration_spark.operators.sampling import temperature_weights


def _sizes(spark, rows):
    return spark.createDataFrame(rows, ["lang", "nt"])


def test_temperature_boosts_small_strata(spark):
    rows = [("big", 100_000), ("small", 100)]
    out = {
        r.lang: r
        for r in temperature_weights(_sizes(spark, rows), "lang", "nt", 0.3).collect()
    }
    assert out["small"].boost > 1.0 > out["big"].boost
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-5
    # α=0.3 compresses the 1000× size gap to 1000^0.3 ≈ 7.9× in weight
    ratio = out["big"].weight / out["small"].weight
    assert 7.0 < ratio < 9.0


def test_temperature_alpha_one_is_natural_share(spark):
    rows = [("a", 300), ("b", 100), ("c", 600)]
    out = temperature_weights(_sizes(spark, rows), "lang", "nt", 1.0).collect()
    assert all(abs(r.boost - 1.0) < 1e-5 for r in out)
    w = {r.lang: r.weight for r in out}
    assert abs(w["c"] - 0.6) < 1e-5


def test_temperature_alpha_zero_is_uniform(spark):
    rows = [("a", 300), ("b", 7)]
    out = temperature_weights(_sizes(spark, rows), "lang", "nt", 0.0).collect()
    assert all(abs(r.weight - 0.5) < 1e-5 for r in out)


def test_contamination_scores_planted_overlap(spark):
    train = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),          # 2 shingles, 1 shared
            (2, "one two three four five"),         # 3 shingles, all shared
            (3, "totally unrelated clean words"),   # 0 shared
        ],
        ["doc_id", "text"],
    )
    eval_set = spark.createDataFrame(
        [(100, "alpha beta gamma xxx"), (101, "one two three four five")],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r for r in contamination_scores(train, eval_set, n=3).collect()
    }
    assert out[1].n_shingles == 2 and out[1].n_contaminated == 1
    assert abs(out[1].contaminated_frac - 0.5) < 1e-9
    assert out[2].n_contaminated == out[2].n_shingles == 3
    assert out[3].n_contaminated == 0 and out[3].contaminated_frac == 0.0


def test_contamination_short_doc_whole_text_gram(spark):
    """Docs shorter than n words contribute their whole text as one
    shingle (word_ngrams' short-doc rule) — an exact short dup of an
    eval doc must score 1.0, not escape via an empty shingle set."""
    train = spark.createDataFrame([(1, "tiny doc")], ["doc_id", "text"])
    eval_set = spark.createDataFrame([(9, "tiny doc")], ["doc_id", "text"])
    row = contamination_scores(train, eval_set, n=3).collect()[0]
    assert row.n_shingles == 1 and row.contaminated_frac == 1.0
