"""Bitmap-based EXACT distinct aggregation — the groupBitmap /
roaring-bitmap pattern (ClickHouse, Druid): represent a set of
integer keys as 64-bit words (word_idx = key div 64, bit = key mod
64), so distinct counts become ``sum(bit_count(word))`` and — the
property HLL cannot offer exactly — set UNIONS across days/segments
become ``bit_or`` folds of stored words. A continuous "distinct users
this week/month" rollup never re-scans raw events and never
approximates.

Where it sits next to HLL (`hll_sketch_rollup`): HLL is O(1.5 kB) per
group at ~2% error for UNBOUNDED key spaces; bitmaps are exact with
storage ∝ key-space/64 per group — the right tool when ids are dense
integers (surrogate user keys are, by construction — SURVEY §7.2).
For sparse/64-bit id spaces, the flat word table degrades to ~one
16-byte row per KEY (every 64-key word holds a single bit), which is
where the roaring-container packing below takes over (r7, VERDICT r6
#6 — Chambi et al. 2016, "Better bitmap performance with Roaring
bitmaps"): the key space splits into 65,536-value containers
(container = key div 2^16), and each container stores its values in
whichever of the format's two shapes is smaller —

- an **array container** (sorted array of 16-bit low values) when
  the container holds ≤ `array_cutoff` values (Roaring's published
  threshold is 4096 = the break-even point where 2-byte values
  outgrow the 8 KiB dense bitmap), or
- a **bitmap container** (1024 densely-packed 64-bit words).

Sparse ids ⇒ almost-empty containers ⇒ 2-byte array slots instead of
64-bit words with one set bit; dense ids ⇒ full containers ⇒ the
same packed words as the flat table. Cardinality is a stored per-
container count; union folds containers by key (array∪array,
bitmap∨bitmap, promotion on overflow) — the identical plan shape as
the flat words (group-keyed groupBy + fold), which is what the gate
query attests.

Scale: the bitmap build is one map-side-combined shuffle keyed
(group, word_idx) — roaring adds one container-keyed aggregation on
the WORD table (≤ keyspace/64 rows, never events); merges and
cardinalities run on container tables (≤ #containers rows per
group). Every container payload is bounded (≤ 4096 array slots / 1024
words), so no collect_list ever exceeds 8 KiB per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_bitmap(
    df: DataFrame, group_cols: list[str], key_col: str
) -> DataFrame:
    """Bitmap words ``(group..., word_idx, word)`` over a non-negative
    integer key column. Duplicate keys collapse in the bit_or — the
    bitmap IS the distinct set.

    Negative keys RAISE per-row (the hdr_histogram domain-guard
    convention): Spark's ``div``/``%`` truncate toward zero while
    DuckDB's ``//`` floors, so an out-of-domain key would silently
    desynchronize word/bit assignment between engines instead of
    failing loudly."""
    guarded = F.when(F.col(key_col) >= 0, F.col(key_col)).otherwise(
        F.raise_error(
            F.concat(
                F.lit(
                    f"key_bitmap: negative key in column '{key_col}' — "
                    "domain is non-negative integer ids, got "
                ),
                F.col(key_col).cast("string"),
            )
        )
    )
    rows = df.select(
        *group_cols,
        guarded.alias("_k"),
    ).select(
        *group_cols,
        F.expr("_k div 64").alias("word_idx"),
        F.expr("shiftleft(1L, cast(_k % 64 as int))").alias("w"),
    )
    return rows.groupBy(*group_cols, "word_idx").agg(
        F.expr("cast(bit_or(w) as long)").alias("word")
    )


def bitmap_merge(bm: DataFrame, group_cols: list[str]) -> DataFrame:
    """Union bitmaps down to ``group_cols`` (drop finer grouping
    columns first): bit_or per word — set union with zero rescan."""
    return bm.groupBy(*group_cols, "word_idx").agg(
        F.expr("cast(bit_or(word) as long)").alias("word")
    )


def bitmap_cardinality(bm: DataFrame, group_cols: list[str]) -> DataFrame:
    """Exact distinct count per group: Σ popcount(word)."""
    return bm.groupBy(*group_cols).agg(
        F.sum(F.bit_count("word")).cast("long").alias("n_distinct")
    )


# --------------------------------------------------------------------------
# Roaring-style container packing (module docstring; Chambi et al. 2016).
# Container schema: (group..., container, kind, card, vals, words) with
# kind ∈ {'array', 'bitmap'}, vals = sorted array<int> of 16-bit low
# values (array kind, NULL otherwise), words = exactly 1024 longs
# (bitmap kind, NULL otherwise).
# --------------------------------------------------------------------------

#: Roaring's published array/bitmap break-even: 4096 2-byte slots = the
#: 8 KiB a dense 2^16-bit container always costs.
ROARING_ARRAY_CUTOFF = 4096

#: Set-bit positions of a word as ascending ints — shiftright is
#: arithmetic on the sign bit but `& 1` still extracts bit 63 exactly.
_BITS_OF_WORD = "filter(sequence(0, 63), b -> (shiftright({w}, b) & 1) = 1)"


def roaring_pack(
    words: DataFrame,
    group_cols: list[str],
    array_cutoff: int = ROARING_ARRAY_CUTOFF,
) -> DataFrame:
    """Pack a flat word table ``(group..., word_idx, word)`` into
    roaring containers. One container-keyed aggregation over the word
    table; per-container state is ≤ 1024 (offset, word) entries."""
    per = (
        words.filter(F.col("word") != 0)
        .select(
            *group_cols,
            F.expr("word_idx div 1024").alias("container"),
            F.expr("cast(word_idx % 1024 as int)").alias("offset"),
            "word",
        )
        .groupBy(*group_cols, "container")
        .agg(
            F.sum(F.bit_count("word")).cast("int").alias("card"),
            F.sort_array(
                F.collect_list(F.struct(F.col("offset"), F.col("word")))
            ).alias("_entries"),
        )
    )
    vals = F.expr(
        "flatten(transform(_entries, e -> "
        f"transform({_BITS_OF_WORD.format(w='e.word')}, "
        "b -> e.offset * 64 + b)))"
    )
    dense = F.expr(
        "transform(sequence(0, 1023), i -> coalesce("
        "element_at(map_from_entries(transform(_entries, "
        "e -> struct(e.offset, e.word))), i), 0L))"
    )
    return per.select(
        *group_cols,
        "container",
        F.when(F.col("card") <= array_cutoff, F.lit("array"))
        .otherwise(F.lit("bitmap"))
        .alias("kind"),
        "card",
        F.when(F.col("card") <= array_cutoff, vals).alias("vals"),
        F.when(F.col("card") > array_cutoff, dense).alias("words"),
    )


def roaring_bitmap(
    df: DataFrame,
    group_cols: list[str],
    key_col: str,
    array_cutoff: int = ROARING_ARRAY_CUTOFF,
) -> DataFrame:
    """Roaring containers straight from raw keys: the flat word build
    (one map-side-combined shuffle) + :func:`roaring_pack`."""
    return roaring_pack(
        key_bitmap(df, group_cols, key_col), group_cols, array_cutoff
    )


def roaring_words(bm: DataFrame, group_cols: list[str]) -> DataFrame:
    """Inverse of :func:`roaring_pack` — back to the flat word table.
    Array containers re-bucket their low values (≤ array_cutoff rows
    each before the fold); bitmap containers posexplode their 1024
    words, zeros dropped."""
    arr = (
        bm.filter(F.col("kind") == "array")
        .select(*group_cols, "container", F.explode("vals").alias("v"))
        .select(
            *group_cols,
            F.expr("container * 1024 + (v div 64)").alias("word_idx"),
            F.expr("shiftleft(1L, cast(v % 64 as int))").alias("w"),
        )
        .groupBy(*group_cols, "word_idx")
        .agg(F.expr("cast(bit_or(w) as long)").alias("word"))
    )
    den = (
        bm.filter(F.col("kind") == "bitmap")
        .select(*group_cols, "container", F.posexplode("words").alias("pos", "word"))
        .filter(F.col("word") != 0)
        .select(
            *group_cols,
            F.expr("container * 1024 + pos").alias("word_idx"),
            "word",
        )
    )
    return arr.unionByName(den)


def roaring_merge(
    bm: DataFrame,
    group_cols: list[str],
    array_cutoff: int = ROARING_ARRAY_CUTOFF,
) -> DataFrame:
    """Union roaring bitmaps down to ``group_cols``: unpack → bit_or
    fold per word → repack. Handles every kind combination (array ∪
    array, bitmap ∨ bitmap, mixed with promotion/demotion) through the
    one word-level fold — the same algebra the flat table uses, so the
    merged set is exactly the set of the union."""
    return roaring_pack(
        bitmap_merge(roaring_words(bm, group_cols), group_cols),
        group_cols,
        array_cutoff,
    )


def roaring_cardinality(bm: DataFrame, group_cols: list[str]) -> DataFrame:
    """Exact distinct count per group: Σ stored container cardinalities
    (no payload scan — card is materialized at pack time)."""
    return bm.groupBy(*group_cols).agg(
        F.sum("card").cast("long").alias("n_distinct")
    )
