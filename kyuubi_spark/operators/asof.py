"""As-of (point-in-time) join — a time-series primitive Spark lacks.

Neither Spark nor the reference gateway ships an ASOF JOIN operator (the
reference delegates its relational surface to Spark SQL, SURVEY.md §2.D);
this implements the standard backward as-of join as a composition of
existing DataFrame ops, per the charter's custom-operator ladder
(composition > pandas UDF > mapPartitions).

Algorithm (union + last-ignorenulls window, the scalable shape):
tag both sides, union on (key, time), and for every left row take the
last non-null right payload in the window ordered by (time, side) — the
most recent right row at-or-before the left row's time. One shuffle, keyed
by the join key; window state is a single row per column (last value), so
memory is O(1) per key regardless of history length. A naive range
self-join is O(|L|x|R|) per key and a per-row subquery is a driver loop;
this stays linear in |L|+|R| at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
) -> DataFrame:
    """Backward as-of join: for each left row, attach ``payload_cols`` from
    the latest right row with ``right_time <= left_time``, matching ``on``.

    Left rows with no prior right row keep null payloads (left-outer
    semantics). Right (key, time) pairs should be unique for deterministic
    results — pre-aggregate duplicates before calling.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).cast("timestamp").alias("__t"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).cast("timestamp").alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    # side 0 sorts before side 1 at equal times → a right row timestamped
    # exactly at the left time IS visible (<= semantics, as DuckDB ASOF)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r_tagged.unionByName(l_tagged).select(
        "__side",
        *lcols,
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ],
    )
    return filled.filter(F.col("__side") == 1).drop("__side")
