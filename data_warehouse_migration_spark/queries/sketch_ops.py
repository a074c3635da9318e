"""Hash-sketch gate queries (round 6): Bloom-filter ingest prefilter
and count-min heavy hitters — the fixed-memory substitutes for
corpus-sized indexes in the incremental-ingest path.

Registered outside the round-6 attestation window (the 50 slots were
already allocated, ROTATION.md); covered by tools/check_oracle.py and
the judge sweep, r7 window head-of-line candidates.

Cross-engine exactness: everything here is integer (md5-derived
bucket arithmetic + counts), so the oracles reproduce the sketches
bit-for-bit — the only care point is mirroring the md5 nibble decode
exactly (``_h_sql`` below = operators/sketches.hash_mod).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.catalog import query, t
from data_warehouse_migration_spark.operators.dedup import content_digest

_NIBBLES = "0123456789abcdef"


def _h_sql(expr: str, seed: int, m: int) -> str:
    """DuckDB twin of operators/sketches.hash_mod: first 8 md5 hex
    nibbles of (expr ':' seed) as a 32-bit int, mod m."""
    inner = f"md5({expr} || ':{seed}')"
    terms = " + ".join(
        f"(strpos('{_NIBBLES}', substr({inner}, {j + 1}, 1)) - 1) * {16 ** (7 - j)}"
        for j in range(8)
    )
    return f"(({terms}) % {m})"


_NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"

_BLOOM_M = 4096
_BLOOM_K = 4


def _bloom_oracle() -> str:
    digest_hashes = "\nUNION ALL\n".join(
        f"SELECT digest, {_h_sql('digest', i, _BLOOM_M)} AS bit_pos FROM dig"
        for i in range(_BLOOM_K)
    )
    probe_hashes = "\nUNION ALL\n".join(
        f"SELECT doc_id, {_h_sql('digest', i, _BLOOM_M)} AS bit_pos FROM batch"
        for i in range(_BLOOM_K)
    )
    # The canonical 16-bit md5 bucket split lives in llm_ops (the
    # single source quality_ops' curation pipelines also import) —
    # re-inlining the nibble arithmetic here was exactly the
    # desynchronization risk that comment warns about (ADVICE r6).
    from data_warehouse_migration_spark.queries.llm_ops import _MD5_BUCKET_SQL

    return f"""
WITH split AS (
    SELECT doc_id, {_NORM_SQL} AS txt,
           CASE WHEN {_MD5_BUCKET_SQL} < CAST(0.9 * 65536 AS INT)
                THEN 'corpus' ELSE 'batch' END AS s
    FROM documents
), alldig AS (SELECT doc_id, s, md5(txt) AS digest FROM split),
dig AS (SELECT DISTINCT digest FROM alldig WHERE s = 'corpus'),
bits AS (SELECT DISTINCT bit_pos FROM ({digest_hashes})),
batch AS (SELECT doc_id, digest FROM alldig WHERE s = 'batch'),
probe AS (
    {probe_hashes}
),
maybe AS (
    SELECT p.doc_id,
           (min(CASE WHEN b.bit_pos IS NULL THEN 0 ELSE 1 END) = 1)
               AS maybe_member
    FROM probe p LEFT JOIN bits b ON p.bit_pos = b.bit_pos
    GROUP BY 1
),
exact AS (
    SELECT ba.doc_id, min(c.doc_id) AS corpus_match
    FROM batch ba JOIN (SELECT doc_id, digest FROM alldig WHERE s = 'corpus') c
      ON ba.digest = c.digest
    GROUP BY 1
)
SELECT b.doc_id, m.maybe_member, e.corpus_match,
       CASE WHEN e.corpus_match IS NOT NULL THEN 'dup'
            WHEN m.maybe_member THEN 'false_positive'
            ELSE 'new' END AS status
FROM batch b
JOIN maybe m ON b.doc_id = m.doc_id
LEFT JOIN exact e ON b.doc_id = e.doc_id
"""


@query(
    "bloom_prefilter_dedup",
    tags=("dedup", "sketch", "bloom", "incremental"),
    oracle=_bloom_oracle(),
)
def bloom_prefilter_dedup(spark, sf_dir):
    """Bloom-prefiltered incremental exact dedup: an incoming batch is
    screened against a {m}-bit / {k}-hash Bloom filter built from the
    at-rest corpus digests (operators/sketches.py), then only the
    maybe-members pay the exact digest join. Per-doc verdicts expose
    the filter's structure — 'dup' (bloom hit, confirmed), a visible
    'false_positive' band (bloom hit, no corpus match — the ~(1-e^(-kn/m))^k
    tax the fixed bit budget buys), and 'new' (settled by the
    broadcast bitmap alone, zero corpus I/O; no false negatives by
    construction).

    Scale: the filter is ≤ m rows however large the corpus grows —
    the corpus digest index is scanned ONCE to build it (and is
    incrementally maintainable by unioning new batches' bits). The
    exact join's left side shrinks from |batch| to |dups|+|fp|.
    Corpus/batch = the content-addressed 90/10 hash split, the
    incremental-dedup convention (dedup_incremental_batch)."""
    from data_warehouse_migration_spark.operators.sampling import hash_split
    from data_warehouse_migration_spark.operators.sketches import (
        bloom_bits,
        bloom_maybe_member,
    )

    docs = hash_split(t(spark, sf_dir, "documents"), "doc_id", {"corpus": 0.9, "batch": 0.1})
    digests = docs.select(
        "doc_id", "split", content_digest(F.col("text")).alias("digest")
    )
    corpus = digests.filter(F.col("split") == "corpus").select("doc_id", "digest")
    batch = digests.filter(F.col("split") == "batch").select("doc_id", "digest")

    bits = bloom_bits(corpus.select("digest").distinct(), "digest", _BLOOM_M, _BLOOM_K)
    screened = bloom_maybe_member(batch, bits, "digest", _BLOOM_M, _BLOOM_K)
    exact = (
        screened.filter(F.col("maybe_member"))
        .join(corpus.withColumnRenamed("doc_id", "c_id"), "digest", "left")
        .groupBy("doc_id")
        .agg(F.min("c_id").alias("corpus_match"))
    )
    return (
        screened.join(exact, "doc_id", "left")
        .select(
            "doc_id",
            "maybe_member",
            "corpus_match",
            F.when(F.col("corpus_match").isNotNull(), F.lit("dup"))
            .when(F.col("maybe_member"), F.lit("false_positive"))
            .otherwise(F.lit("new"))
            .alias("status"),
        )
    )


bloom_prefilter_dedup.__doc__ = bloom_prefilter_dedup.__doc__.replace(
    "{m}", str(_BLOOM_M)
).replace("{k}", str(_BLOOM_K))


_CMS_D = 4
_CMS_W = 512
_TOPK = 20


def _cms_oracle() -> str:
    cell_rows = "\nUNION ALL\n".join(
        f"SELECT {r} AS r, {_h_sql('tok', r, _CMS_W)} AS bucket, c FROM wc"
        for r in range(_CMS_D)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT tok, {r} AS r, {_h_sql('tok', r, _CMS_W)} AS bucket FROM top"
        for r in range(_CMS_D)
    )
    return f"""
WITH words AS (
    SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok FROM documents
), wc AS (
    SELECT tok, count(*) AS c FROM words WHERE tok <> '' GROUP BY tok
), counters AS (
    SELECT r, bucket, CAST(sum(c) AS BIGINT) AS total
    FROM ({cell_rows}) GROUP BY r, bucket
), top AS (
    SELECT tok, c FROM (
        SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok) AS rn FROM wc
    ) WHERE rn <= {_TOPK}
), est AS (
    SELECT p.tok, min(ct.total) AS cms_est
    FROM ({probe_rows}) p JOIN counters ct USING (r, bucket)
    GROUP BY p.tok
)
SELECT top.tok AS token, CAST(top.c AS BIGINT) AS exact_cnt, est.cms_est
FROM top JOIN est ON top.tok = est.tok
"""


@query(
    "heavy_hitters_cms",
    tags=("sketch", "count-min", "frequency"),
    oracle=_cms_oracle(),
)
def heavy_hitters_cms(spark, sf_dir):
    """Count-min-sketch frequency estimation over the corpus token
    stream (Cormode & Muthukrishnan 2005): a {d}x{w} counter grid
    replaces the vocabulary-sized count table, and the top-{k} tokens'
    estimates are read back against their exact counts — the gate
    checks both the grid construction (est ≥ exact always; collisions
    visibly inflate) and the probe path.

    Scale: the sketch is {d}·{w} cells whatever the vocabulary — it
    builds with one map-side-combined shuffle, merges across
    days/partitions by cell-wise sum (sketch of union = sum of
    sketches), and broadcasts for zero-shuffle probes. The exact
    count table here exists only to attest the estimates at test SF."""
    from pyspark.sql import Window
    from data_warehouse_migration_spark.operators.sketches import (
        cms_counters,
        cms_estimate,
        word_counts,
    )

    docs = t(spark, sf_dir, "documents")
    wc = word_counts(docs)
    counters = cms_counters(wc, "tok", "c", _CMS_D, _CMS_W)
    top = (
        wc.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("c"), "tok"))
        )
        .filter(F.col("rn") <= _TOPK)
        .select("tok", "c")
    )
    return cms_estimate(top, counters, "tok", _CMS_D, _CMS_W).select(
        F.col("tok").alias("token"),
        F.col("c").alias("exact_cnt"),
        "cms_est",
    )


heavy_hitters_cms.__doc__ = (
    heavy_hitters_cms.__doc__.replace("{d}", str(_CMS_D))
    .replace("{w}", str(_CMS_W))
    .replace("{k}", str(_TOPK))
)


@query(
    "hdr_quantile_sketch",
    tags=("sketch", "quantiles", "histogram", "mergeable"),
    oracle="""
WITH c AS (
    SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents FROM events
), b AS (
    SELECT event_type,
           CAST(length(bin(cents)) - 1 AS INT) AS e,
           CAST(CASE WHEN length(bin(cents)) - 1 >= 4
                     THEN (cents // (1::BIGINT << (length(bin(cents)) - 5))) - 16
                     ELSE ((cents * 16) // (1::BIGINT << (length(bin(cents)) - 1))) - 16
                END AS INT) AS sub
    FROM c
), h AS (
    SELECT event_type, e, sub, count(*) AS cnt FROM b GROUP BY 1, 2, 3
), w AS (
    SELECT event_type, e, sub, cnt,
           sum(cnt) OVER (PARTITION BY event_type ORDER BY e, sub) AS cum,
           sum(cnt) OVER (PARTITION BY event_type) AS total,
           (16 + sub) * (1::BIGINT << e) AS lo_scaled
    FROM h
)
SELECT event_type,
       CAST(max(total) AS BIGINT) AS n_values,
       round(min(CASE WHEN cum >= (5000 * total + 9999) // 10000 THEN lo_scaled END)
             / 16.0 / 100.0, 6) AS p50_est,
       round(min(CASE WHEN cum >= (9500 * total + 9999) // 10000 THEN lo_scaled END)
             / 16.0 / 100.0, 6) AS p95_est,
       round(min(CASE WHEN cum >= (9900 * total + 9999) // 10000 THEN lo_scaled END)
             / 16.0 / 100.0, 6) AS p99_est
FROM w GROUP BY 1
""",
)
def hdr_quantile_sketch(spark, sf_dir):
    """Mergeable log2-histogram quantiles per event type
    (operators/histogram_sketch.py, the HdrHistogram/DDSketch family):
    the gate builds PER-DAY partial sketches and folds them
    (`merge_histograms`) before the readout, while the oracle computes
    the histogram from all events in one shot — equality attests the
    defining claim that the merge is EXACT (sum of histograms ≡
    histogram of the union), not just the bucket arithmetic. Bucketing
    is pure integer math (binary-string floor-log2, `div`
    sub-buckets), so estimates reproduce bit-for-bit on any engine;
    estimates are lower bounds within 1/16 relative of the true
    quantile.

    Where this beats percentile_approx at 100 TB: the sketch is a
    storable, mergeable TABLE — per-partition partials fold across
    days/clusters with zero accuracy loss and no re-scan, the
    continuous-aggregate pattern applied to percentiles."""
    from data_warehouse_migration_spark.operators.histogram_sketch import (
        hdr_histogram,
        hdr_quantiles,
        merge_histograms,
    )

    ev = t(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = hdr_histogram(ev, ["event_type", "day"], "cents")
    merged = merge_histograms(daily.drop("day"))
    return hdr_quantiles(merged, ["event_type"], qs=(0.5, 0.95, 0.99))


_FH_N = 64


def _feature_hash_oracle() -> str:
    return f"""
WITH words AS (
    SELECT doc_id, unnest(string_split({_NORM_SQL}, ' ')) AS tok
    FROM documents
), wc AS (
    SELECT doc_id, tok, count(*) AS c FROM words WHERE tok <> '' GROUP BY 1, 2
), h AS (
    SELECT doc_id,
           {_h_sql('tok', 0, _FH_N)} AS feature_idx,
           CASE WHEN {_h_sql('tok', 1, 2)} = 0 THEN c ELSE -c END AS v
    FROM wc
)
SELECT doc_id, CAST(feature_idx AS BIGINT) AS feature_idx,
       CAST(sum(v) AS BIGINT) AS value
FROM h GROUP BY 1, 2
"""


@query(
    "feature_hash_vectors",
    tags=("sketch", "features", "hashing-trick"),
    oracle=_feature_hash_oracle(),
)
def feature_hash_vectors(spark, sf_dir):
    """Hashing-trick document features
    (operators/sketches.feature_hash; Weinberger et al. 2009): each
    document's token counts fold into a FIXED {n}-bucket signed
    feature vector with no vocabulary table — the zero-global-state
    text vectorizer (vs tfidf_top_terms' df pass + vocab join). Sparse
    (doc, feature_idx, value) rows, signed so collisions cancel in
    expectation; every bucket and sign recomputed by the oracle."""
    from data_warehouse_migration_spark.operators.sketches import (
        feature_hash,
        word_counts,
    )

    docs = t(spark, sf_dir, "documents")
    wc = word_counts(docs, group_cols=("doc_id",))
    return feature_hash(wc, "doc_id", "tok", "c", _FH_N).select(
        "doc_id",
        F.col("feature_idx").cast("long").alias("feature_idx"),
        "value",
    )


feature_hash_vectors.__doc__ = feature_hash_vectors.__doc__.replace(
    "{n}", str(_FH_N)
)
