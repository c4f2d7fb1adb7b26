"""Result-set wire encoding: Hive-style value rendering + TRowSet shapes.

Counterparts in the reference:
- RowSet.toHiveString (externals/kyuubi-spark-sql-engine/.../schema/
  RowSet.scala:40-58) delegates nested-value rendering to Spark's
  HiveResult: arrays `[a,b]`, maps `{k:v}` with sorted entries, structs
  `{"field":value}`, nested strings quoted, nested null lowercase.
- TRowSetGenerator.toRowBasedSet/toColumnBasedSet (kyuubi-common/.../engine/
  result/TRowSetGenerator.scala:25-59): protocol >= V6 ships columnar
  TColumns (one values vector + null bitmask per column), older protocols
  ship row-based TRows. We reproduce both shapes as JSON-able dicts; the
  columnar layout, default-fill of nulls, and bitmask semantics match, and
  gateway.thrift frames the columnar shape as real TBinaryProtocol TColumns
  for the socket frontend.
"""

from __future__ import annotations

import math
from datetime import date, datetime, timedelta
from decimal import Decimal
from typing import Any, Sequence

from pyspark.sql import types as T

__all__ = [
    "to_hive_string",
    "to_row_based_set",
    "to_column_based_set",
    "wire_safe_df",
]


def _fmt_daytime_interval(td: timedelta) -> str:
    """HIVE-style day-time interval: ``[-]d hh:mm:ss.fffffffff`` with a
    9-digit fraction and the sign on the day field even for -0 — the
    exact strings the reference's RowSet ships (RowSet.scala
    toDayTimeIntervalString HIVE_STYLE; SparkDataTypeTests.scala:251-277
    pins e.g. ``-0 00:59:30.000000000``)."""
    micros = (
        td.days * 86_400_000_000 + td.seconds * 1_000_000 + td.microseconds
    )
    sign = "-" if micros < 0 else ""
    a = abs(micros)
    days, rest = divmod(a, 86_400_000_000)
    hh, rest = divmod(rest, 3_600_000_000)
    mm, rest = divmod(rest, 60_000_000)
    ss, us = divmod(rest, 1_000_000)
    return f"{sign}{days} {hh:02d}:{mm:02d}:{ss:02d}.{us * 1000:09d}"


def _fmt_float(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    return repr(v)


def _fmt_ts(v: datetime) -> str:
    # session-tz wall clock, trailing zero micros trimmed (HiveResult)
    s = v.strftime("%Y-%m-%d %H:%M:%S")
    if v.microsecond:
        s += (".%06d" % v.microsecond).rstrip("0")
    return s


def to_hive_string(value: Any, dt: T.DataType, nested: bool = False) -> str:
    """Render one value the way HiveResult.toHiveString does (the wire
    format JDBC clients see for nested types, SchemaHelper maps
    ARRAY/MAP/STRUCT to STRING columns carrying these)."""
    if value is None:
        return "null" if nested else "NULL"
    if isinstance(dt, T.ArrayType):
        return "[" + ",".join(
            to_hive_string(v, dt.elementType, True) for v in value
        ) + "]"
    if isinstance(dt, T.MapType):
        entries = sorted(
            to_hive_string(k, dt.keyType, True)
            + ":"
            + to_hive_string(v, dt.valueType, True)
            for k, v in value.items()
        )
        return "{" + ",".join(entries) + "}"
    if isinstance(dt, T.StructType):
        vals = list(value)
        return "{" + ",".join(
            f'"{f.name}":{to_hive_string(v, f.dataType, True)}'
            for f, v in zip(dt.fields, vals)
        ) + "}"
    if isinstance(dt, T.BooleanType):
        return "true" if value else "false"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return _fmt_float(float(value))
    if isinstance(dt, T.DecimalType):
        return str(Decimal(value))
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return _fmt_ts(value)
    if isinstance(dt, T.DayTimeIntervalType):
        return _fmt_daytime_interval(value)
    if isinstance(dt, T.DateType):
        return value.isoformat() if isinstance(value, date) else str(value)
    if isinstance(dt, T.BinaryType):
        return bytes(value).decode("utf-8", errors="replace")
    if isinstance(dt, T.StringType):
        return f'"{value}"' if nested else str(value)
    return str(value)


# thrift TColumn default-fills null slots and flags them in a bitmask
_DEFAULTS: list[tuple[type, Any]] = [
    (T.BooleanType, False),
    (T.ByteType, 0), (T.ShortType, 0), (T.IntegerType, 0), (T.LongType, 0),
    (T.FloatType, 0.0), (T.DoubleType, 0.0),
    (T.BinaryType, b""),
]


def _default_for(dt: T.DataType) -> Any:
    for typ, d in _DEFAULTS:
        if isinstance(dt, typ):
            return d
    return ""  # everything else rides the string column


def _is_string_carried(dt: T.DataType) -> bool:
    """Complex/temporal/decimal values ride the STRING TColumn, pre-rendered
    with toHiveString (ExecuteStatement.scala:245-247 stringifies complex
    types before the wire; SchemaHelper maps them to STRING)."""
    return not isinstance(
        dt,
        (
            T.BooleanType, T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.StringType, T.BinaryType,
        ),
    )


def _null_bitmask(nulls: Sequence[bool]) -> bytes:
    out = bytearray((len(nulls) + 7) // 8)
    for i, isnull in enumerate(nulls):
        if isnull:
            out[i // 8] |= 1 << (i % 8)
    return bytes(out)


def to_row_based_set(rows: Sequence[Sequence[Any]], schema: T.StructType) -> dict:
    """Pre-V6 row-oriented shape: one rendered cell list per row."""
    return {
        "startRowOffset": 0,
        "rows": [
            [to_hive_string(v, f.dataType) for v, f in zip(row, schema.fields)]
            for row in rows
        ],
    }


def to_column_based_set(rows: Sequence[Sequence[Any]], schema: T.StructType) -> dict:
    """V6+ columnar shape: per column one values vector (nulls default-
    filled) + a little-endian null bitmask, exactly the TColumn layout."""
    columns = []
    for i, f in enumerate(schema.fields):
        cells = [row[i] for row in rows]
        nulls = [c is None for c in cells]
        string_carried = _is_string_carried(f.dataType)
        values = [
            _default_for(f.dataType)
            if c is None
            else (to_hive_string(c, f.dataType) if string_carried else c)
            for c in cells
        ]
        columns.append(
            {
                "name": f.name,
                "type": f.dataType.simpleString(),
                "values": values,
                "nulls": _null_bitmask(nulls),
            }
        )
    return {"startRowOffset": 0, "columns": columns}


def wire_safe_df(df):
    """Replace columns whose values cannot cross the Python driver
    boundary with their JVM-rendered wire strings, keeping every other
    column intact.  Returns (df, changed).

    The reference stringifies these JVM-side before the wire too
    (ExecuteStatement.scala:245-247 + SchemaHelper: VARIANT and
    CalendarInterval map to STRING; RowSet renders year-month intervals
    HIVE-style, SparkDataTypeTests.scala:290-310 pins e.g. ``0-3``).
    PySpark additionally CANNOT collect YearMonthIntervalType /
    CalendarIntervalType / VariantType rows at all (fromInternal
    unimplemented), so the rendering must happen before collection:

    - year-month interval → normalize to INTERVAL YEAR TO MONTH, cast to
      the ANSI string, extract the quoted body: ``0-3`` / ``-3-1`` —
      exactly the HIVE_STYLE form;
    - calendar interval / variant → plain CAST(x AS STRING) (the Hive
      wording ``1 hours 2 minutes``, JSON text respectively).

    Day-time intervals are untouched: they collect as timedelta and
    to_hive_string renders them; Arrow ships them as duration[us].
    Metadata is unaffected — callers keep the ORIGINAL schema for
    GetResultSetMetadata, so clients still see INTERVAL_YEAR_MONTH etc.
    """
    from pyspark.sql import functions as F

    exprs = []
    changed = False
    for i, f in enumerate(df.schema.fields):
        col = df[i]  # positional: immune to duplicate/odd names
        if isinstance(f.dataType, T.YearMonthIntervalType):
            changed = True
            exprs.append(
                F.regexp_extract(
                    col.cast("interval year to month").cast("string"),
                    r"'(.*)'",
                    1,
                ).alias(f.name)
            )
        elif f.dataType.simpleString() in ("interval", "variant"):
            changed = True
            exprs.append(col.cast("string").alias(f.name))
        else:
            exprs.append(col)
    return (df.select(*exprs), True) if changed else (df, False)
