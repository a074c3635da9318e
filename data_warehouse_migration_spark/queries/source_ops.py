"""Source/domain-level curation — the axis web-scale corpora actually
get filtered on (C4 kept/dropped DOMAINS, RefinedWeb capped per-site,
Gopher gated whole sources on quality priors): `documents.source` is
the domain surrogate, and these gates cover the three domain-shaped
moves a 100 TB pipeline makes —

- a per-source CENSUS with a quality prior and a keep/review verdict
  (`source_mix_census`),
- a deterministic PER-SOURCE CAP, the RefinedWeb/C4 anti-domination
  resample (`source_cap_sample`),
- MIRROR DETECTION: which source pairs share verbatim 10-gram spans
  (`cross_source_span_overlap`) — the site-level view of the span
  dedup family, cheap because it runs on the span INDEX, not text.

All registered after the r7 window sealed → head of the r8 rotation
plan (ROTATION.md), gated meanwhile by tools/check_oracle.py + pytest.

Scale posture: every output here is source-cardinality sized (domains
are the SMALL axis — millions at web scale, 20 at test SF), per-source
work is one map-side-combined shuffle or one bounded rank window, and
the mirror matrix is capped at |sources|² pairs built from a
distinct-(gram, source) index — text never shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.catalog import query, t
from data_warehouse_migration_spark.operators.dedup import normalized_text

_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

#: Short-doc fraction above which a source is flagged for review —
#: the Gopher-style "document length" prior applied at SOURCE level.
_SHORT_TOKENS = 20
_REVIEW_FRAC = 0.15

#: RefinedWeb-style per-source cap (test-scale value; production sets
#: this per corpus — the mechanism, not the constant, is the gate).
_SOURCE_CAP = 5


@query(
    "source_mix_census",
    tags=("source", "curation", "census", "quality"),
    oracle=f"""
WITH n AS (
    SELECT source, lang, n_chars,
           len(string_split({_NORM_SQL}, ' ')) AS tok
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(sum(tok) AS BIGINT) AS total_tokens,
       round(CAST(sum(tok) AS BIGINT) / CAST(count(*) AS BIGINT), 6)
           AS mean_tokens,
       CAST(sum(CASE WHEN tok < {_SHORT_TOKENS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_short_docs,
       round(CAST(sum(CASE WHEN tok < {_SHORT_TOKENS} THEN 1 ELSE 0 END)
             AS BIGINT) / CAST(count(*) AS BIGINT), 6) AS short_frac,
       CASE WHEN CAST(sum(CASE WHEN tok < {_SHORT_TOKENS} THEN 1 ELSE 0 END)
                 AS BIGINT) / CAST(count(*) AS BIGINT) > {_REVIEW_FRAC}
            THEN 'review' ELSE 'keep' END AS verdict
FROM n GROUP BY source
""",
)
def source_mix_census(spark, sf_dir):
    """Per-source corpus census + source-level quality gating (the
    Gopher/RefinedWeb move of scoring whole DOMAINS, not documents):
    doc/char/language/token totals, the short-document fraction as
    the quality prior, and a keep/review verdict at {frac} — sources
    whose short-doc share exceeds the prior get routed to review
    instead of silently polluting the mix. Exactness: totals are
    integer sums; the two ratios divide once at the end and round to
    6 after identical IEEE ops (catalog.py rules).

    Scale: ONE map-side-combined shuffle keyed on source; the output
    is source-cardinality sized. The verdict threshold fires on real
    testdata (short_frac spans 0–0.20 at sf0.01), so both CASE arms
    are value-attested."""
    docs = t(spark, sf_dir, "documents")
    tok = F.size(F.split(normalized_text(F.col("text")), " "))
    short = F.when(tok < _SHORT_TOKENS, 1).otherwise(0)
    g = docs.select("source", "lang", "n_chars", tok.alias("tok"), short.alias("s"))
    n = F.count(F.lit(1))
    n_short = F.sum("s").cast("long")
    return g.groupBy("source").agg(
        n.cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("tok").cast("long").alias("total_tokens"),
        F.round(F.sum("tok").cast("long") / n.cast("long"), 6).alias(
            "mean_tokens"
        ),
        n_short.alias("n_short_docs"),
        F.round(n_short / n.cast("long"), 6).alias("short_frac"),
        F.when(n_short / n.cast("long") > _REVIEW_FRAC, "review")
        .otherwise("keep")
        .alias("verdict"),
    )


source_mix_census.__doc__ = source_mix_census.__doc__.replace(
    "{frac}", str(_REVIEW_FRAC)
)


@query(
    "source_cap_sample",
    tags=("source", "sampling", "cap", "anti-domination"),
    oracle=f"""
WITH r AS (
    SELECT source, n_chars,
           row_number() OVER (PARTITION BY source
                              ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rn
    FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN rn <= {_SOURCE_CAP} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(sum(CASE WHEN rn > {_SOURCE_CAP} THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dropped,
       CAST(sum(CASE WHEN rn <= {_SOURCE_CAP} THEN n_chars ELSE 0 END)
            AS BIGINT) AS kept_chars
FROM r GROUP BY source
""",
)
def source_cap_sample(spark, sf_dir):
    """Per-source document cap — the RefinedWeb/C4 anti-domination
    resample that stops one crawled site from owning the training
    mix: each source keeps its {cap} lowest-md5-rank documents (the
    deterministic unbiased draw of eval_sample_per_lang — identical
    sample on every engine/run/cluster size, no rand()), and the gate
    attests the kept/dropped census with kept characters.

    Scale: one shuffle on source; the rank window is bounded by
    per-source size — exactly the sessionize posture. The census
    (rather than the kept rows) is the gate output so the attested
    frame stays source-cardinality sized; the kept rows themselves
    are the `rn <= cap` filter one line up."""
    from pyspark.sql import Window

    docs = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    r = docs.select("source", "n_chars", F.row_number().over(w).alias("rn"))
    kept = F.when(F.col("rn") <= _SOURCE_CAP, 1).otherwise(0)
    return r.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(kept).cast("long").alias("n_kept"),
        F.sum(1 - kept).cast("long").alias("n_dropped"),
        F.sum(F.col("n_chars") * kept).cast("long").alias("kept_chars"),
    )


source_cap_sample.__doc__ = source_cap_sample.__doc__.replace(
    "{cap}", str(_SOURCE_CAP)
)


@query(
    "cross_source_span_overlap",
    tags=("source", "dedup", "spans", "mirror-detection"),
    oracle=f"""
WITH n AS (
    SELECT doc_id, source, string_split({_NORM_SQL}, ' ') AS w
    FROM documents
), e AS (
    SELECT doc_id, source, w FROM n WHERE len(w) >= 10
), sh AS (
    SELECT DISTINCT source, md5(array_to_string(w[i+1:i+10], ' ')) AS g
    FROM (SELECT doc_id, source, w, unnest(range(0, len(w) - 9)) AS i FROM e)
)
SELECT a.source AS source_a, b.source AS source_b,
       count(*) AS n_shared_10grams
FROM sh a JOIN sh b ON b.g = a.g AND a.source < b.source
GROUP BY 1, 2
""",
)
def cross_source_span_overlap(spark, sf_dir):
    """Mirror/syndication detection between SOURCES: for every source
    pair, the number of distinct verbatim 10-token spans both carry —
    the site-level rollup of the Lee et al. span-dedup family
    (`duplicate_span_pairs` finds document pairs; this finds which
    DOMAINS copy each other, the signal crawl curation uses to drop
    whole mirrors). Distinct (gram, source) keying means a span
    repeated in many documents of both sources counts ONCE — the
    overlap measures shared CONTENT, not shared volume. Shared-gram
    counts are hash-scheme-independent (distinct xxhash64 grams ==
    distinct gram strings), which the md5-keyed oracle attests — the
    duplicate_span_pairs convention.

    Scale: the index is distinct (gram digest, source) — one shuffle,
    ≤ |sources| rows per gram by construction, so no gram bucket can
    explode the pair join past |sources|²; the output matrix is
    domain-cardinality², never doc-scaled. Text never shuffles."""
    from data_warehouse_migration_spark.operators.dedup import (
        span_hashes_from_words,
    )

    docs = t(spark, sf_dir, "documents")
    words = F.split(normalized_text(F.col("text")), " ")
    sh = (
        docs.filter(F.size(words) >= 10)
        .select(
            "source",
            F.explode(
                F.array_distinct(span_hashes_from_words(words, 10))
            ).alias("g"),
        )
        .distinct()
    )
    a = sh.select(F.col("g"), F.col("source").alias("source_a"))
    b = sh.select(F.col("g"), F.col("source").alias("source_b"))
    return (
        a.join(b, (a["g"] == b["g"]) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_10grams"))
    )
