"""Streaming operators as driver-verified queries.

The tumbling-window aggregate replayed from the bounded events table has an
exact relational equivalent (GROUP BY the hour bucket), so the streaming
path — file source → watermark → windowed state → memory sink — gets a real
value-level oracle, not just a row count.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kyuubi_spark.functions.compat import dround
from kyuubi_spark.queries import query
from kyuubi_spark.session import ensure_runtime_confs


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.streaming.runner import file_stream

    ensure_runtime_confs(spark)
    raw = file_stream(spark, os.path.join(sf_dir, "events.parquet"))
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp")
        )
    return raw


@query(
    "stream_tumbling_agg",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2 ORDER BY window_start, event_type
    """,
    doc="Structured Streaming tumbling-window aggregate (file source → "
    "watermark → windowed state → memory sink), replay-verified against "
    "the batch GROUP BY.",
)
def stream_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.streaming.runner import run_to_memory
    from kyuubi_spark.streaming.windows import tumbling_counts

    stream = _events_stream(spark, sf_dir)
    result = run_to_memory(tumbling_counts(stream, "1 hour"), output_mode="complete")
    return result.select(
        # memory-sink timestamps are session-tz; normalize to naive UTC like
        # the batch tables
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n",
        dround("sum_value", 2).alias("sum_value"),
    ).orderBy("window_start", "event_type")


@query(
    "stream_stateful_totals",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events, ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
    doc="Custom stateful streaming operator (applyInPandasWithState per-key "
    "running totals in the state store), replay-verified.",
)
def stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kyuubi_spark.streaming.runner import run_to_memory
    from kyuubi_spark.streaming.stateful import running_user_totals

    stream = _events_stream(spark, sf_dir)
    result = run_to_memory(running_user_totals(stream), output_mode="update")
    return result.select(
        "user_id", "n_events", dround("total_value", 2).alias("total_value")
    ).orderBy("user_id")
