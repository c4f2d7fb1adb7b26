"""Windowed streaming aggregations with watermark-driven late-data policy.

Spark-first shapes (pyspark_guide patterns): `F.window` tumbling/sliding,
`F.session_window` gap-based sessions, all over `withWatermark`. Each
builder takes an events-shaped streaming DataFrame (ts TIMESTAMP, user_id,
event_type, value) and returns the windowed aggregate; sinks/triggers are
the caller's choice (tests use availableNow + memory sink).

Scale notes: watermark bounds state (old windows evict once the watermark
passes), so state size is O(active windows × keys), independent of stream
length — the property that makes these run indefinitely at 100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    window_size: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Per-(window, event_type) count + value sum, tumbling windows."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    window_size: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event rates (overlapping windows)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size, slide).alias("win"))
        .agg(F.count("*").alias("n"), F.approx_count_distinct("user_id").alias("users"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n",
            "users",
        )
    )


def session_windows(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session windows per user (F.session_window — the streaming
    twin of the batch sessionization query win_sessionize)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("win"), "user_id")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("session_start"),
            F.col("win.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def stream_static_join(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static broadcast enrich: per-batch map-side join, no state."""
    dim = F.broadcast(
        customer.select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment", "c_nationkey"
        )
    )
    return events.join(dim, "user_id", "left")
