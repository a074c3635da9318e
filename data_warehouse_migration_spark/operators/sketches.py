"""Hash-sketch operators: Bloom-filter membership prefilter and
count-min-sketch frequency estimation (Cormode & Muthukrishnan 2005).

Why they exist at 100 TB: exact dedup against a multi-PB at-rest
corpus means joining every incoming batch against a digest index
whose size tracks the corpus. A Bloom filter compresses that index to
a fixed bit budget (m bits for ~m/10 members at 1% fp), so the common
case — a genuinely new document — is settled by a broadcast bitmap
probe with NO shuffle against the corpus; only the tiny maybe-member
remainder pays the exact digest join. Count-min answers "how often
does this token/URL/domain occur" with d·w counters instead of a
vocabulary-sized table, and the counter grid is mergeable across
partitions, days, and clusters (sum of sketches = sketch of union).

Determinism: every hash function is md5-derived (``hash_mod``) — the
same bit positions and counter buckets on any engine, partitioning,
or rerun, which is what lets a DuckDB oracle recompute the sketches
bit-for-bit (Spark's xxhash64/murmur are not portable to other
engines; md5 is everywhere).

Representation: sketches are returned as small DataFrames (set bit
positions / counter cells), not driver-side bitsets — they compose
with joins and unions, persist to Parquet as first-class tables, and
merge by ``union + groupBy``. A set-bit table at the default sizing
is ≤ m rows of one long each; at deployment scale you'd pack it to
m/64 bitmap words with ``bit_pos div 64`` + ``bit_or(1 << pos%64)``
— same plan shape, smaller broadcast. Both are tiny next to the data.

No counterpart in the reference (its dedup story is full-index SQL
joins, sql_scripts/load_gold_data.sql:1-132); this is north-star
surface for the incremental-ingest path (`operators/dedup.py`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_mod(col: Column, seed: int, m: int) -> Column:
    """Deterministic seeded hash of a string column into ``[0, m)``.

    First 8 hex nibbles of md5(value ':' seed) read as a 32-bit int,
    mod m. Portable: any engine with md5 + substring reproduces it
    (tools/check_oracle.py's DuckDB side uses a strpos nibble decode
    of the same bytes). 32 bits of entropy is plenty for bucket
    counts ≤ 2^26; keys are uniform over [0, 2^32) before the mod.
    """
    h = F.conv(F.substring(F.md5(F.concat(col, F.lit(f":{seed}"))), 1, 8), 16, 10)
    return (h.cast("long") % m).alias(f"h{seed}")


def bloom_bits(
    df: DataFrame, key_col: str, m: int, k: int
) -> DataFrame:
    """Set-bit positions ``(bit_pos)`` of an m-bit Bloom filter over
    ``key_col`` with k seeded hash functions.

    One pass over the corpus: explode k positions per key (k small,
    map-local), distinct on the position — shuffle volume is bounded
    by min(corpus·k, m) longs, i.e. by the FILTER size, not the
    corpus. Mergeable: union of bit tables = filter of the union.
    """
    positions = F.explode(
        F.array(*[hash_mod(F.col(key_col), i, m) for i in range(k)])
    ).alias("bit_pos")
    return df.select(positions).distinct()


def bloom_maybe_member(
    batch: DataFrame, bits: DataFrame, key_col: str, m: int, k: int
) -> DataFrame:
    """``batch`` + boolean ``maybe_member``: True iff ALL k bit
    positions of the key are set in ``bits`` (no false negatives;
    false-positive rate ≈ (1 − e^(−kn/m))^k).

    The bits table is broadcast — it is ≤ m rows by construction —
    so the probe is shuffle-free on the batch side: explode k
    positions, hash-probe the broadcast set, and require EVERY probed
    position to be set (``min`` over the hit flags — not a ``count ==
    k``, which reads 2k rows for a key that appears twice in the
    batch and k−1 distinct positions for a key whose hashes self-
    collide, breaking the no-false-negative guarantee either way).
    """
    probed = batch.select(
        F.col(key_col),
        F.explode(
            F.array(*[hash_mod(F.col(key_col), i, m) for i in range(k)])
        ).alias("bit_pos"),
    )
    hits = (
        probed.join(
            F.broadcast(bits.withColumn("_set", F.lit(1))), "bit_pos", "left"
        )
        .groupBy(key_col)
        .agg((F.min(F.coalesce(F.col("_set"), F.lit(0))) == 1).alias("maybe_member"))
    )
    return batch.join(hits, key_col, "left")


def cms_counters(
    items: DataFrame,
    item_col: str,
    count_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """Count-min counter grid ``(r, bucket, total)`` over pre-counted
    items (pass count=1 rows for raw streams).

    depth×width cells regardless of vocabulary size; built with one
    shuffle on (r, bucket) after map-side combine. Mergeable by
    ``union → groupBy(r, bucket) → sum`` — the streaming/daily
    rollup story needs no re-scan of history.
    """
    rows = items.select(
        F.col(item_col),
        F.col(count_col).cast("long").alias("_c"),
        F.posexplode(
            F.array(*[hash_mod(F.col(item_col), r, width) for r in range(depth)])
        ).alias("r", "bucket"),
    )
    return rows.groupBy("r", "bucket").agg(F.sum("_c").alias("total"))


def cms_estimate(
    queries: DataFrame,
    counters: DataFrame,
    item_col: str,
    depth: int,
    width: int,
) -> DataFrame:
    """``queries`` + ``cms_est``: min over the d counter cells the item
    hashes to — an upper bound on the true count (within εN with
    probability 1−δ for w=⌈e/ε⌉, d=⌈ln 1/δ⌉).

    The counter grid (d·w cells) is broadcast; the probe is a
    zero-shuffle lookup per query row + a groupBy on the query key
    bounded by the query set size.
    """
    probed = queries.select(
        F.col(item_col),
        F.posexplode(
            F.array(*[hash_mod(F.col(item_col), r, width) for r in range(depth)])
        ).alias("r", "bucket"),
    )
    est = (
        probed.join(F.broadcast(counters), ["r", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("total"), F.lit(0))).alias("cms_est"))
    )
    return queries.join(est, item_col, "left")


def bloom_words(bits: DataFrame, m: int) -> DataFrame:
    """Pack a set-bit table into ``m/64`` bitmap words ``(word_idx,
    word)`` — the deployment broadcast form (64× fewer rows, fixed
    8·m/64 bytes). ``union → groupBy → bit_or`` merges packed filters
    exactly like bit tables."""
    return (
        bits.select(
            F.expr("bit_pos div 64").alias("word_idx"),
            F.expr("shiftleft(1L, cast(bit_pos % 64 as int))").alias("w"),
        )
        .groupBy("word_idx")
        .agg(F.expr("cast(bit_or(w) as long)").alias("word"))
    )


def bloom_maybe_member_packed(
    batch: DataFrame, words: DataFrame, key_col: str, m: int, k: int
) -> DataFrame:
    """``bloom_maybe_member`` against the packed form: probe joins on
    the word index and tests the bit with a mask — same verdicts as
    the bit-table probe (pinned by test), smaller broadcast."""
    probed = batch.select(
        F.col(key_col),
        F.explode(
            F.array(*[hash_mod(F.col(key_col), i, m) for i in range(k)])
        ).alias("bit_pos"),
    ).select(
        key_col,
        F.expr("bit_pos div 64").alias("word_idx"),
        F.expr("shiftleft(1L, cast(bit_pos % 64 as int))").alias("mask"),
    )
    hits = (
        probed.join(F.broadcast(words), "word_idx", "left")
        .withColumn(
            "_set",
            (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(F.col("mask")) != 0),
        )
        .groupBy(key_col)
        .agg((F.min(F.col("_set").cast("int")) == 1).alias("maybe_member"))
    )
    return batch.join(hits, key_col, "left")


def feature_hash(
    tokens: DataFrame,
    doc_col: str,
    token_col: str,
    count_col: str,
    n_features: int,
    signed: bool = True,
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): per-document sparse
    feature vectors of FIXED dimensionality ``n_features`` with no
    vocabulary table — bucket = hash(token) mod n, value = Σ ±count
    (the sign from an independent hash makes collisions cancel in
    expectation instead of only inflating, the property that lets
    hashed features feed linear models unbiased).

    Returns sparse rows ``(doc, feature_idx, value)`` — the join-
    friendly form (assemble arrays downstream if a dense layout is
    needed). Rows whose signed contributions cancel to 0 are kept:
    dropping them would make the output depend on collision layout.

    Scale: no vocabulary state AT ALL — the reason this beats TF-IDF
    at 100 TB feature extraction (no global df pass, no vocab
    broadcast, new tokens never resize anything). One shuffle on
    (doc, bucket) with map-side combine. md5-portable hashes: the
    DuckDB oracle recomputes every bucket and sign.
    """
    sign = (
        F.when(hash_mod(F.col(token_col), 1, 2) == 0, F.lit(1)).otherwise(
            F.lit(-1)
        )
        if signed
        else F.lit(1)
    )
    rows = tokens.select(
        F.col(doc_col),
        hash_mod(F.col(token_col), 0, n_features).alias("feature_idx"),
        (sign * F.col(count_col).cast("long")).alias("_v"),
    )
    return rows.groupBy(doc_col, "feature_idx").agg(
        F.sum("_v").alias("value")
    )


def word_counts(docs: DataFrame, text_col: str = "text", group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Normalized-token counts ``(group..., tok, c)`` — THE tokenization
    every sketch consumer shares (batch CMS, its streaming partials,
    feature hashing). One definition on purpose: the streaming gates'
    "bit-identical to batch" attestations hold only while both sides
    tokenize identically, so the token stream must not be re-derived
    per call site. Empty tokens dropped; map-side combined."""
    from data_warehouse_migration_spark.operators.dedup import normalized_text

    tok = docs.select(
        *group_cols,
        F.explode(F.split(normalized_text(F.col(text_col)), " ")).alias("tok"),
    ).filter(F.col("tok") != "")
    return tok.groupBy(*group_cols, "tok").agg(F.count(F.lit(1)).alias("c"))
