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
from datetime import date, datetime
from decimal import Decimal
from typing import Any, Sequence

from pyspark.sql import types as T

__all__ = ["to_hive_string", "to_row_based_set", "to_column_based_set"]


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
