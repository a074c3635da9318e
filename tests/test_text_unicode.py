"""Unicode tokenization family (functions/text.unicode_*) — Spark-side
behaviors the cross-engine gate deliberately leaves out (VT handling)
plus the ASCII-equivalence property the gate shows on the fixture."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.functions.text import (
    bpe_ish_token_count,
    token_count,
    unicode_bpe_ish_token_count,
    unicode_normalized_text,
    unicode_token_count,
    unicode_tokens,
)


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_unicode_whitespace_splits(spark):
    # NBSP, ideographic space, thin space, Zl, Zp, and VT (U+000B —
    # excluded from the cross-engine gate because legacy `\s` is the
    # one class Java/RE2 disagree on; the UNICODE class handles it
    # explicitly) all split words.
    for ws in (" ", "　", " ", " ", " ", "\x0b"):
        assert _one(spark, f"a{ws}b", unicode_token_count(F.col("text"))) == 2
        # legacy ASCII path: only VT splits (Java \s includes it)
        legacy = _one(spark, f"a{ws}b", token_count(F.col("text")))
        assert legacy == (2 if ws == "\x0b" else 1)


def test_unicode_letter_and_number_runs(spark):
    assert _one(spark, "Привет мир", unicode_token_count(F.col("text"))) == 2
    # CJK without spaces: one letter run; each emoji is its own symbol
    assert _one(spark, "中文分词", unicode_bpe_ish_token_count(F.col("text"))) == 1
    assert (
        _one(spark, "hi \U0001f600\U0001f680", unicode_bpe_ish_token_count(F.col("text")))
        == 3
    )
    # fullwidth + Arabic-Indic digits are \p{N} runs
    assert _one(spark, "ab １２３ ١٢٣", unicode_bpe_ish_token_count(F.col("text"))) == 3
    # legacy pattern sees none of these as letters/digits
    assert _one(spark, "Привет", bpe_ish_token_count(F.col("text"))) == 6


def test_case_folding(spark):
    assert (
        _one(spark, "GROßE ΣΟΦΙΑ", unicode_normalized_text(F.col("text")))
        == "große σοφια"
    )


def test_empty_text_yields_zero_tokens(spark):
    assert _one(spark, "", unicode_token_count(F.col("text"))) == 0
    assert _one(spark, "   ", unicode_token_count(F.col("text"))) == 0
    assert _one(spark, "", unicode_tokens(F.col("text"))) == []


def test_ascii_equivalence_on_fixture(spark, sf_dir):
    """On the pure-ASCII fixture corpus the Unicode path must be a
    conservative generalization: identical token and subtoken counts
    (the property the gate's docs rows expose as equal columns)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    diff = docs.filter(
        (token_count(F.col("text")) != unicode_token_count(F.col("text")))
        | (
            bpe_ish_token_count(F.col("text"))
            != unicode_bpe_ish_token_count(F.col("text"))
        )
    ).count()
    assert diff == 0
