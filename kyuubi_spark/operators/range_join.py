"""Range (interval) join with a bucketed equi-join scale path.

A bare range predicate (``l.t BETWEEN r.start AND r.end``) gives Spark no
equi-key, so it plans BroadcastNestedLoopJoin — O(|L|x|R|) and
broadcast-bound; fine for a small right side, fatal at 100 TB. The
standard fix (used by every production interval-join implementation,
including Structured Streaming's stream-stream interval join state
layout): quantize time into coarse buckets, explode each right interval
into the buckets it covers, equi-join on (keys..., bucket) — hash
shuffle, codegen — then re-check the exact predicate. Cost is
O(|L| + |R| x avg_span/bucket + matches); bucket width tunes the explode
factor against join selectivity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_time: str,
    right_start: str,
    right_end: str,
    on: list[str] | None = None,
    bucket_seconds: int = 86400,
    how: str = "inner",
) -> DataFrame:
    """Join left rows whose ``left_time`` falls in [right_start, right_end]
    (inclusive), optionally also matching equi-keys ``on``.

    All three time columns are cast to TIMESTAMP; output carries every
    column of both inputs (equi-key columns once).
    """
    lt = F.col(left_time).cast("timestamp")
    rs = F.col(right_start).cast("timestamp")
    re_ = F.col(right_end).cast("timestamp")
    b = F.lit(bucket_seconds)

    l_b = left.withColumn("__bucket", (lt.cast("long") / b).cast("long"))
    r_b = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence((rs.cast("long") / b).cast("long"), (re_.cast("long") / b).cast("long"))
        ),
    )
    keys = ["__bucket", *(on or [])]
    joined = l_b.join(r_b, keys, how).filter(
        (F.col(left_time).cast("timestamp") >= F.col(right_start).cast("timestamp"))
        & (F.col(left_time).cast("timestamp") <= F.col(right_end).cast("timestamp"))
    )
    return joined.drop("__bucket")


def range_condition(left_time: Column, start: Column, end: Column) -> Column:
    """The exact predicate, for small-side broadcast fallback."""
    t = left_time.cast("timestamp")
    return (t >= start.cast("timestamp")) & (t <= end.cast("timestamp"))
