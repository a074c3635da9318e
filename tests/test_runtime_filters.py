"""Runtime row-level filtering (Spark's InjectRuntimeFilter): on a
fact⋈filtered-dim shuffle join, the optimizer builds a Bloom filter
from the selective side and semi-join-reduces the FACT SCAN before the
shuffle — at 100 TB this is the difference between shuffling the whole
fact table and shuffling only rows that can match. The session posture
leaves `spark.sql.optimizer.runtime.bloomFilter.enabled` at its
default (true); injection gates on the application side exceeding
`applicationSideScanSizeThreshold` (default 10 GB — a threshold every
real fact table clears and sf0.1 test files never do), so this test
lowers the threshold to make the local plan show what the production
plan does, and pins both the injection and result equality."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_bloom_runtime_filter_injects_and_preserves_results(spark, sf_dir):
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force the shuffle join
    }
    saved = {k: spark.conf.get(k) for k in confs}

    def run():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        return (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.round(F.col("l_quantity") * 100).cast("long")).alias(
                    "qty_cents"
                ),
            )
        )

    baseline = sorted(map(tuple, run().collect()))
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = run()
        df.collect()
        physical = df._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in physical, (
            "runtime Bloom filter did not inject — the fact scan would "
            "shuffle unreduced at scale:\n" + physical[:2000]
        )
        assert sorted(map(tuple, df.collect())) == baseline
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
