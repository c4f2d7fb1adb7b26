"""AQE skew-join handling: the runtime re-plan the 100 TB story leans on.

session.py enables spark.sql.adaptive.skewJoin; this test proves the
mechanism actually fires — a synthetic hot key forces a skewed sort-merge
join and the final adaptive plan must carry the skew=true split marker —
so the claim "AQE splits skewed partitions" is pinned, not assumed.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # trip the skew detector at toy scale (sizes are COMPRESSED shuffle
        # bytes, hence the incompressible md5 payload below)
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 200k rows on ONE key + a uniform tail vs a small dim; md5 payload
        # keeps the hot partition large after shuffle compression
        big = spark.range(220_000).select(
            F.when(F.col("id") < 200_000, F.lit(0))
            .otherwise(F.col("id") % 97)
            .alias("k"),
            F.md5(F.col("id").cast("string").cast("binary")).alias("payload"),
        )
        dim = spark.range(97).select(
            F.col("id").alias("k"), F.lit("x").alias("tag")
        )
        joined = big.join(dim, "k")
        # inspect the SAME QueryExecution that ran: collect() finalizes the
        # adaptive plan on `joined` itself (count()/write would execute a
        # separate QueryExecution and leave this one isFinalPlan=false)
        assert len(joined.collect()) == 220_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, "AQE did not split the skewed partition"
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_runtime_bloom_filter_prunes_selective_join(spark, sf_dir):
    """Runtime Bloom-filter pruning — the mechanism the contamination-check
    docstring names for 100 TB: a selective non-broadcast join injects a
    bloom_filter_agg on the small side and a might-contain probe above the
    big side's scan, so most fact rows drop before the shuffle."""
    import os

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        from pyspark.sql import functions as F

        li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan
        assert "might_contain" in plan.lower()
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_fires(spark, tmp_path):
    """Dynamic partition pruning: a star join whose dim-side filter only
    resolves at runtime must inject a dynamicpruning subquery on the fact
    scan, so only matching fact partitions are read."""
    from pyspark.sql import functions as F

    fact_path = str(tmp_path / "fact")
    spark.range(50_000).selectExpr(
        "id", "CAST(id % 20 AS INT) AS dim_id", "md5(CAST(id AS STRING)) AS pay"
    ).write.partitionBy("dim_id").mode("overwrite").parquet(fact_path)
    fact = spark.read.parquet(fact_path)
    dim = spark.range(20).select(
        F.col("id").alias("dim_id"),
        F.when(F.col("id") < 3, F.lit("pick")).otherwise(F.lit("skip")).alias("flag"),
    )
    j = fact.join(dim, "dim_id").filter(F.col("flag") == "pick")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), "no DPP filter on the fact scan"
    assert j.count() == sum(1 for i in range(50_000) if i % 20 < 3)
