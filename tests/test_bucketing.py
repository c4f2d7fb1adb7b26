"""Bucketed co-located joins: the no-shuffle proof.

Writes orders/lineitem-shaped tables bucketed on the join key and asserts
the join and the bucket-key aggregation plan WITHOUT a shuffle Exchange,
while an unbucketed control join DOES shuffle. This is the storage-side
scale lever: at 100 TB the bucketed fact-to-fact join moves zero rows
over the network.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kyuubi_spark.operators.bucketing import (
    bucketed_join,
    plan_has_exchange,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("va")
    )
    b = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 31).alias("vb")
    )
    # disable auto-broadcast so the control join is a genuine shuffle join
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    write_bucketed(a, "bkt_a", ["k"], num_buckets=4, sort_cols=["k"])
    write_bucketed(b, "bkt_b", ["k"], num_buckets=4, sort_cols=["k"])
    a.write.mode("overwrite").saveAsTable("plain_a")
    b.write.mode("overwrite").saveAsTable("plain_b")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in ("bkt_a", "bkt_b", "plain_a", "plain_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    joined = bucketed_join(spark, "bkt_a", "bkt_b", ["k"])
    assert not plan_has_exchange(joined), joined._jdf.queryExecution().executedPlan().toString()
    control = spark.table("plain_a").join(spark.table("plain_b"), ["k"])
    assert plan_has_exchange(control)
    # identical results either way
    assert joined.count() == control.count() == 10_000


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_tables):
    agg = spark.table("bkt_a").groupBy("k").agg(F.sum("va").alias("s"))
    assert not plan_has_exchange(agg)
    control = spark.table("plain_a").groupBy("k").agg(F.sum("va").alias("s"))
    assert plan_has_exchange(control)
    assert agg.count() == control.count() == 10_000
