"""Bloom-filter and count-min-sketch invariants (operators/sketches.py).

The gate queries (bloom_prefilter_dedup, heavy_hitters_cms) attest the
exact values against DuckDB; these tests pin the SKETCH GUARANTEES the
values must obey on any input — no Bloom false negatives, count-min
never under-estimates — plus the hash-portability contract.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.sketches import (
    bloom_bits,
    bloom_maybe_member,
    cms_counters,
    cms_estimate,
    hash_mod,
)

M, K = 1024, 3


def test_hash_mod_range_and_determinism(spark):
    df = spark.range(200).select(F.concat(F.lit("key-"), F.col("id")).alias("s"))
    hashed = df.select(hash_mod(F.col("s"), 0, 64).alias("h0"),
                       hash_mod(F.col("s"), 1, 64).alias("h1"))
    rows = hashed.collect()
    assert all(0 <= r.h0 < 64 and 0 <= r.h1 < 64 for r in rows)
    # seeds decorrelate: the two hash streams must not be identical
    assert any(r.h0 != r.h1 for r in rows)
    assert hashed.collect() == rows  # rerun-stable


def test_bloom_no_false_negatives_and_bounded(spark):
    members = spark.range(300).select(
        F.concat(F.lit("doc:"), F.col("id")).alias("key")
    )
    bits = bloom_bits(members, "key", M, K)
    assert bits.count() <= M
    screened = bloom_maybe_member(members, bits, "key", M, K)
    assert screened.filter(~F.col("maybe_member")).count() == 0


def test_bloom_rejects_most_non_members(spark):
    members = spark.range(300).select(
        F.concat(F.lit("doc:"), F.col("id")).alias("key")
    )
    bits = bloom_bits(members, "key", M, K)
    probes = spark.range(300).select(
        F.concat(F.lit("other:"), F.col("id")).alias("key")
    )
    fp = bloom_maybe_member(probes, bits, "key", M, K).filter(
        F.col("maybe_member")
    ).count()
    # theoretical fp ≈ (1 - e^(-K*300/M))^K ≈ 21% at this deliberately
    # tight sizing; 50% would mean the hashes are correlated/broken.
    assert fp < 150


def test_cms_never_underestimates(spark):
    wc = (
        spark.range(500)
        .select((F.col("id") % 37).alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("c"))
        .select(F.concat(F.lit("tok"), F.col("k")).alias("tok"), "c")
    )
    counters = cms_counters(wc, "tok", "c", depth=4, width=16)  # force collisions
    est = cms_estimate(wc, counters, "tok", depth=4, width=16)
    assert est.filter(F.col("cms_est") < F.col("c")).count() == 0


def test_cms_exact_when_no_collisions(spark):
    wc = spark.createDataFrame(
        [("a", 5), ("b", 3), ("c", 11)], ["tok", "c"]
    )
    counters = cms_counters(wc, "tok", "c", depth=4, width=4096)
    est = cms_estimate(wc, counters, "tok", depth=4, width=4096)
    assert est.filter(F.col("cms_est") != F.col("c")).count() == 0


def test_cms_grid_is_mergeable(spark):
    """sketch(A) + sketch(B) cell-wise == sketch(A ∪ B) — the property
    that makes daily/streaming rollups a sum, not a re-scan."""
    a = spark.createDataFrame([("x", 2), ("y", 7)], ["tok", "c"])
    b = spark.createDataFrame([("x", 3), ("z", 1)], ["tok", "c"])
    merged = (
        cms_counters(a, "tok", "c", 3, 32)
        .union(cms_counters(b, "tok", "c", 3, 32))
        .groupBy("r", "bucket")
        .agg(F.sum("total").alias("total"))
    )
    direct = cms_counters(a.union(b), "tok", "c", 3, 32)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0


def test_packed_bloom_matches_bit_table(spark):
    """The m/64-word packed filter must produce identical verdicts to
    the bit-table probe on members AND non-members, and merge by
    bit_or exactly."""
    from data_warehouse_migration_spark.operators.sketches import (
        bloom_maybe_member_packed,
        bloom_words,
    )

    members = spark.range(250).select(
        F.concat(F.lit("doc:"), F.col("id")).alias("key")
    )
    probes = spark.range(500).select(
        F.when(F.col("id") < 250, F.concat(F.lit("doc:"), F.col("id")))
        .otherwise(F.concat(F.lit("other:"), F.col("id")))
        .alias("key")
    )
    bits = bloom_bits(members, "key", M, K)
    words = bloom_words(bits, M)
    assert words.count() <= M // 64 + 1
    flat = {
        r.key: r.maybe_member
        for r in bloom_maybe_member(probes, bits, "key", M, K).collect()
    }
    packed = {
        r.key: r.maybe_member
        for r in bloom_maybe_member_packed(probes, words, "key", M, K).collect()
    }
    assert flat == packed
    # merging packed filters: words(A ∪ B) == bit_or fold of words(A), words(B)
    a = spark.range(100).select(F.concat(F.lit("doc:"), F.col("id")).alias("key"))
    b = spark.range(100, 250).select(
        F.concat(F.lit("doc:"), F.col("id")).alias("key")
    )
    merged = (
        bloom_words(bloom_bits(a, "key", M, K), M)
        .union(bloom_words(bloom_bits(b, "key", M, K), M))
        .groupBy("word_idx")
        .agg(F.expr("cast(bit_or(word) as long)").alias("word"))
    )
    assert sorted(merged.collect()) == sorted(words.collect())


def test_feature_hash_fixed_dim_and_sign_cancellation(spark):
    from data_warehouse_migration_spark.operators.sketches import feature_hash

    wc = spark.createDataFrame(
        [(1, f"tok{i}", i + 1) for i in range(200)], ["doc", "tok", "c"]
    )
    out = feature_hash(wc, "doc", "tok", "c", n_features=16).collect()
    assert all(0 <= r.feature_idx < 16 for r in out)
    assert len(out) <= 16  # fixed dimensionality regardless of vocab
    # signed: absolute bucket mass ≤ unsigned mass wherever collisions mix signs
    unsigned = feature_hash(
        wc, "doc", "tok", "c", n_features=16, signed=False
    ).collect()
    u = {r.feature_idx: r.value for r in unsigned}
    assert all(abs(r.value) <= u[r.feature_idx] for r in out)
    # unsigned totals conserve mass exactly
    assert sum(u.values()) == sum(range(1, 201))


def test_bloom_duplicate_probe_keys_no_false_negative(spark):
    """A key appearing TWICE in the probe batch (duplicate texts — the
    very thing a dedup pipeline sees) must still read maybe_member=
    True when it is a member: the count==k formulation saw 2k probe
    rows per key and reported a false negative (review finding)."""
    members = spark.createDataFrame([("dup-key",), ("other",)], ["key"])
    bits = bloom_bits(members, "key", M, K)
    probes = spark.createDataFrame(
        [("dup-key",), ("dup-key",), ("absent-key",)], ["key"]
    )
    out = bloom_maybe_member(probes, bits, "key", M, K).collect()
    verdicts = {}
    for r in out:
        verdicts.setdefault(r.key, set()).add(r.maybe_member)
    assert verdicts["dup-key"] == {True}
    assert len([r for r in out if r.key == "dup-key"]) == 2

    from data_warehouse_migration_spark.operators.sketches import (
        bloom_maybe_member_packed,
        bloom_words,
    )

    packed = bloom_maybe_member_packed(
        probes, bloom_words(bits, M), "key", M, K
    ).collect()
    assert {r.maybe_member for r in packed if r.key == "dup-key"} == {True}


def test_bitmap_exact_distinct_and_union(spark):
    """Bitmap popcount == true COUNT(DISTINCT); bit_or union across
    groups deduplicates exactly (operators/bitmaps.py)."""
    from data_warehouse_migration_spark.operators.bitmaps import (
        bitmap_cardinality,
        bitmap_merge,
        key_bitmap,
    )

    rows = [("a", u) for u in [1, 1, 63, 64, 65, 200]] + [
        ("b", u) for u in [1, 64, 300, 300]
    ]
    df = spark.createDataFrame(rows, ["g", "uid"])
    bm = key_bitmap(df, ["g"], "uid")
    per_group = {
        r.g: r.n_distinct for r in bitmap_cardinality(bm, ["g"]).collect()
    }
    assert per_group == {"a": 5, "b": 3}
    merged = bitmap_cardinality(
        bitmap_merge(bm.drop("g"), []), []
    ).collect()[0]
    # union: {1, 63, 64, 65, 200, 300} — 1 and 64 shared between groups
    assert merged.n_distinct == 6


def test_key_bitmap_raises_on_negative_key(spark):
    """A negative key would silently desynchronize word/bit assignment
    between engines (Spark div truncates, DuckDB // floors) — the
    operator must fail loudly instead (hdr_histogram convention)."""
    import pytest

    from data_warehouse_migration_spark.operators.bitmaps import key_bitmap

    df = spark.createDataFrame([("a", 1), ("a", -2)], ["g", "uid"])
    with pytest.raises(Exception, match="negative key"):
        key_bitmap(df, ["g"], "uid").collect()


def _roaring_keys(seed: int, n: int) -> list[int]:
    """Mixed-density key sample: a dense block (bitmap containers at
    small cutoffs), a sparse spread (array containers), container-
    boundary values, and duplicates."""
    import random

    rng = random.Random(seed)
    dense = [rng.randrange(0, 300) for _ in range(n)]
    sparse = [rng.randrange(0, 2**40) for _ in range(n // 4)]
    edges = [0, 63, 64, 65535, 65536, 65537, 1024 * 64 - 1, 1024 * 64]
    return dense + sparse + edges + dense[: n // 10]


def test_roaring_equals_flat_bitmap(spark):
    """Equivalence property (VERDICT r6 #6): roaring cardinality ==
    flat-word cardinality == true COUNT(DISTINCT), at both the
    production cutoff and a tiny cutoff that forces bitmap containers;
    pack → unpack round-trips to the identical word table."""
    from data_warehouse_migration_spark.operators.bitmaps import (
        bitmap_cardinality,
        key_bitmap,
        roaring_bitmap,
        roaring_cardinality,
        roaring_pack,
        roaring_words,
    )

    keys = _roaring_keys(3, 400)
    truth = len(set(keys))
    df = spark.createDataFrame([("g", k) for k in keys], ["g", "k"])
    words = key_bitmap(df, ["g"], "k")
    assert bitmap_cardinality(words, ["g"]).collect()[0].n_distinct == truth
    for cutoff in (4096, 4):
        bm = roaring_bitmap(df, ["g"], "k", array_cutoff=cutoff)
        assert (
            roaring_cardinality(bm, ["g"]).collect()[0].n_distinct == truth
        ), cutoff
        # pack → unpack is lossless: identical flat word table
        back = roaring_words(bm, ["g"])
        assert back.exceptAll(words).count() == 0, cutoff
        assert words.exceptAll(back).count() == 0, cutoff
    # the tiny cutoff actually produced bitmap containers (dense block)
    tiny = roaring_bitmap(df, ["g"], "k", array_cutoff=4)
    kinds = {r.kind for r in tiny.collect()}
    assert kinds == {"array", "bitmap"}


def test_roaring_merge_equals_direct_build(spark):
    """Union algebra: merging per-day roaring bitmaps (mixed container
    kinds, overlapping keys) equals the roaring bitmap of the pooled
    keys — container-by-container, not just in cardinality."""
    from data_warehouse_migration_spark.operators.bitmaps import (
        roaring_bitmap,
        roaring_merge,
    )

    k1 = _roaring_keys(7, 300)
    k2 = _roaring_keys(8, 300)  # overlaps k1's dense range
    rows = [("g", "d1", k) for k in k1] + [("g", "d2", k) for k in k2]
    df = spark.createDataFrame(rows, ["g", "day", "k"])
    per_day = roaring_bitmap(df, ["g", "day"], "k", array_cutoff=6)
    merged = roaring_merge(per_day.drop("day"), ["g"], array_cutoff=6)
    direct = roaring_bitmap(df.drop("day"), ["g"], "k", array_cutoff=6)
    assert merged.exceptAll(direct).count() == 0
    assert direct.exceptAll(merged).count() == 0
