"""Streaming CMS maintenance invariants (streaming/sketches.py):
epoch-replay idempotence, fold-equals-batch, compaction neutrality.
The gate query attests exact values on the real streaming engine.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from data_warehouse_migration_spark.operators.sketches import cms_counters
from data_warehouse_migration_spark.streaming.sketches import (
    cms_batch_partial,
    compact_cms,
    read_cms,
)
from data_warehouse_migration_spark.sources.writers import (
    overwrite_partitions_dynamic,
)

D, W = 3, 64


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="cms_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _write_epoch(df, path, epoch):
    overwrite_partitions_dynamic(
        df.withColumn("epoch", F.lit(epoch).cast("long")), path, partition_by=["epoch"]
    )


def test_fold_of_partials_equals_one_shot_sketch(spark, tmpdir):
    a = _docs(spark, [(1, "the cat sat"), (2, "the dog ran")])
    b = _docs(spark, [(3, "the cat ran far away")])
    _write_epoch(cms_batch_partial(a, D, W), tmpdir, 0)
    _write_epoch(cms_batch_partial(b, D, W), tmpdir, 1)
    folded = read_cms(spark, tmpdir)
    direct = cms_batch_partial(a.union(b), D, W)
    assert folded.exceptAll(direct).count() == 0
    assert direct.exceptAll(folded).count() == 0


def test_epoch_replay_does_not_double_count(spark, tmpdir):
    a = _docs(spark, [(1, "alpha beta alpha")])
    _write_epoch(cms_batch_partial(a, D, W), tmpdir, 0)
    before = sorted(read_cms(spark, tmpdir).collect())
    _write_epoch(cms_batch_partial(a, D, W), tmpdir, 0)  # replayed epoch
    assert sorted(read_cms(spark, tmpdir).collect()) == before


def test_compaction_preserves_served_sketch(spark, tmpdir):
    for e in range(3):
        _write_epoch(
            cms_batch_partial(_docs(spark, [(e, f"word{e} common")]), D, W),
            tmpdir,
            e,
        )
    before = sorted(read_cms(spark, tmpdir).collect())
    compact_cms(spark, tmpdir)
    after_df = spark.read.parquet(tmpdir)
    assert after_df.select("epoch").distinct().collect()[0].epoch == -1
    assert sorted(read_cms(spark, tmpdir).collect()) == before


def test_partial_grid_is_bounded(spark, tmpdir):
    many = _docs(spark, [(i, f"tok{i} tok{i % 7} x y z") for i in range(200)])
    grid = cms_batch_partial(many, D, W)
    assert grid.count() <= D * W


def test_anomaly_partials_replay_and_fold(spark, tmpdir):
    """streaming/anomaly.py partials: replayed epoch rewrites (no
    double count) and the fold equals the one-shot hourly totals."""
    import datetime

    from data_warehouse_migration_spark.streaming.anomaly import hourly_partials

    rows = [
        (i, datetime.datetime(2024, 1, 1, h), "click", 1.0 + h)
        for i, h in enumerate([0, 0, 1, 2, 2, 2])
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "event_type", "value"])
    _write_epoch(hourly_partials(ev), tmpdir, 0)
    before = sorted(
        spark.read.parquet(tmpdir)
        .groupBy("event_type", "bucket")
        .agg(F.sum("cents").alias("cents"))
        .collect()
    )
    _write_epoch(hourly_partials(ev), tmpdir, 0)  # replay
    after = sorted(
        spark.read.parquet(tmpdir)
        .groupBy("event_type", "bucket")
        .agg(F.sum("cents").alias("cents"))
        .collect()
    )
    assert before == after
    direct = sorted(hourly_partials(ev).collect())
    assert [(r.event_type, r.bucket, r.cents) for r in after] == [
        (r.event_type, r.bucket, r.cents) for r in direct
    ]


def test_bitmap_partials_replay_and_fold(spark, tmpdir):
    """streaming/bitmaps.py: replayed epoch rewrites; overlapping
    batches fold to the exact union (bit_or idempotence)."""
    import datetime

    from data_warehouse_migration_spark.streaming.bitmaps import (
        bitmap_partials,
        read_bitmap_rollup,
    )

    def ev(rows):
        return spark.createDataFrame(
            [
                (i, datetime.datetime(2024, 1, 1 + d, 9), "click", u, 1.0)
                for i, (d, u) in enumerate(rows)
            ],
            ["event_id", "ts", "event_type", "user_id", "value"],
        )

    a = ev([(0, 1), (0, 2), (1, 1)])
    b = ev([(0, 2), (1, 3)])  # user 2 on day 0 overlaps batch a
    _write_epoch(bitmap_partials(a), tmpdir, 0)
    _write_epoch(bitmap_partials(b), tmpdir, 1)
    _write_epoch(bitmap_partials(b), tmpdir, 1)  # replay
    out = {r.event_type: r for r in read_bitmap_rollup(spark, tmpdir).collect()}
    r = out["click"]
    # day0 users {1,2}, day1 users {1,3}: daily sum 4, total distinct 3
    assert (r.n_days, r.sum_daily_distinct, r.distinct_users_total) == (2, 4, 3)


def test_rolling_wau_from_replayed_partials(spark, tmpdir):
    """streaming/bitmaps.read_rolling_wau: the WAU series served from
    replayed/overlapping epoch partials (multiple event types) equals
    the hand-computed sliding 7-day distinct union — the fold-equals-
    batch property for the one aggregate that doesn't decompose."""
    import datetime

    from data_warehouse_migration_spark.streaming.bitmaps import (
        bitmap_partials,
        read_rolling_wau,
    )

    def ev(rows):
        return spark.createDataFrame(
            [
                (i, datetime.datetime(2024, 1, 1 + d, 9), typ, u, 1.0)
                for i, (d, typ, u) in enumerate(rows)
            ],
            ["event_id", "ts", "event_type", "user_id", "value"],
        )

    # day 0: users {1,2}; day 1: {2,3}; day 8: {1} — day 8 is outside
    # day 1's 7-day window, so its WAU must NOT see days 0-1.
    a = ev([(0, "click", 1), (0, "view", 2), (1, "click", 2)])
    b = ev([(1, "view", 3), (8, "click", 1)])
    _write_epoch(bitmap_partials(a), tmpdir, 0)
    _write_epoch(bitmap_partials(b), tmpdir, 1)
    _write_epoch(bitmap_partials(b), tmpdir, 1)  # replay
    wau = {
        r.day.isoformat(): r.wau
        for r in read_rolling_wau(spark, tmpdir).collect()
    }
    assert wau == {
        "2024-01-01": 2,  # {1,2}
        "2024-01-02": 3,  # {1,2} ∪ {2,3}
        "2024-01-09": 1,  # {1} — window [Jan 3, Jan 9]
    }
    # Compaction folds epochs to one partition; every served result —
    # the rollup AND the WAU series — is unchanged (bit_or algebra).
    from data_warehouse_migration_spark.streaming.bitmaps import (
        compact_bitmap_partials,
        read_bitmap_rollup,
    )

    before = sorted(
        map(tuple, read_bitmap_rollup(spark, tmpdir).collect())
    )
    compact_bitmap_partials(spark, tmpdir)
    epochs = {
        r.epoch
        for r in spark.read.parquet(tmpdir).select("epoch").distinct().collect()
    }
    assert epochs == {-1}
    assert (
        sorted(map(tuple, read_bitmap_rollup(spark, tmpdir).collect()))
        == before
    )
    wau2 = {
        r.day.isoformat(): r.wau
        for r in read_rolling_wau(spark, tmpdir).collect()
    }
    assert wau2 == wau


def test_centroid_partials_split_invariant_and_replay_safe(spark):
    """Embedding-drift centroids (streaming/embedding_drift.py): the
    served centroid table must be identical whether the corpus folds
    from one partial or three, and re-folding a duplicated epoch
    partial (replay WITHOUT dynamic overwrite protection) must be the
    ONLY way to change the result — the integer sums make both
    properties exact, not approximate."""
    from data_warehouse_migration_spark.streaming.embedding_drift import (
        centroid_partials,
        centroids_from_partials,
    )

    rows = [
        (i, [((i * 7 + j * 3) % 11) / 7.0 - 0.5 for j in range(4)], i % 2)
        for i in range(30)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    one = centroids_from_partials(centroid_partials(emb))
    thirds = [
        centroid_partials(emb.filter(F.col("vec_id") % 3 == k))
        for k in range(3)
    ]
    folded = centroids_from_partials(
        thirds[0].unionByName(thirds[1]).unionByName(thirds[2])
    )
    a = sorted(map(tuple, one.collect()))
    b = sorted(map(tuple, folded.collect()))
    assert a == b  # exact, not approx — integer sums fold losslessly

    # a duplicated epoch (replay landing as append instead of
    # overwrite) shifts n and the sums — the served table must differ,
    # proving the dynamic-overwrite discipline is what carries
    # idempotence
    dup = centroids_from_partials(
        thirds[0].unionByName(thirds[0]).unionByName(thirds[1]).unionByName(thirds[2])
    )
    assert sorted(map(tuple, dup.collect())) != a
