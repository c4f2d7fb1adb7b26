"""Spark type → JDBC/HS2 metadata derivations.

Python counterpart of the reference's SchemaHelper
(externals/kyuubi-spark-sql-engine/.../schema/SchemaHelper.scala:40-169):
`toTTypeId` (HS2 type name), `toJavaSQLType` (:107-127), `getColumnSize`
(:135-151) and `getDecimalDigits` (:161-169). Used by GetColumns/GetTypeInfo
so JDBC-shaped metadata rows match the reference bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import types as T

# java.sql.Types constants (JDBC spec).
JAVA_SQL = {
    "NULL": 0, "BOOLEAN": 16, "TINYINT": -6, "SMALLINT": 5, "INTEGER": 4,
    "BIGINT": -5, "FLOAT": 6, "DOUBLE": 8, "VARCHAR": 12, "DECIMAL": 3,
    "DATE": 91, "TIMESTAMP": 93, "BINARY": -2, "ARRAY": 2003, "JAVA_OBJECT": 2000,
    "STRUCT": 2002, "OTHER": 1111,
}


def hs2_type_name(dt: T.DataType) -> str:
    """HS2/Thrift type name (SchemaHelper.toTTypeId, :40-65)."""
    if isinstance(dt, T.NullType):
        return "NULL"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INT"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.StringType):
        return "STRING"
    if isinstance(dt, T.DecimalType):
        return "DECIMAL"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "TIMESTAMP"
    if isinstance(dt, T.BinaryType):
        return "BINARY"
    if isinstance(dt, T.DayTimeIntervalType):
        return "INTERVAL_DAY_TIME"
    if isinstance(dt, T.YearMonthIntervalType):
        return "INTERVAL_YEAR_MONTH"
    if isinstance(dt, T.ArrayType):
        return "ARRAY"
    if isinstance(dt, T.MapType):
        return "MAP"
    if isinstance(dt, T.StructType):
        return "STRUCT"
    return "STRING"  # CalendarInterval / Variant / UDT stringified (:38,54,56)


def java_sql_type(dt: T.DataType) -> int:
    """java.sql.Types code (SchemaHelper.toJavaSQLType, :107-127)."""
    name = hs2_type_name(dt)
    mapping = {
        "NULL": "NULL", "BOOLEAN": "BOOLEAN", "TINYINT": "TINYINT",
        "SMALLINT": "SMALLINT", "INT": "INTEGER", "BIGINT": "BIGINT",
        "FLOAT": "FLOAT", "DOUBLE": "DOUBLE", "STRING": "VARCHAR",
        "DECIMAL": "DECIMAL", "DATE": "DATE", "TIMESTAMP": "TIMESTAMP",
        "BINARY": "BINARY", "ARRAY": "ARRAY", "MAP": "JAVA_OBJECT",
        "STRUCT": "STRUCT", "INTERVAL_DAY_TIME": "OTHER",
        "INTERVAL_YEAR_MONTH": "OTHER",
    }
    return JAVA_SQL[mapping.get(name, "OTHER")]


def column_size(dt: T.DataType) -> int | None:
    """Display/byte size (SchemaHelper.getColumnSize, :135-151)."""
    if isinstance(dt, (T.ByteType, T.BooleanType)):
        return 1
    if isinstance(dt, T.ShortType):
        return 2
    if isinstance(dt, (T.IntegerType, T.FloatType)):
        return 4
    if isinstance(dt, (T.LongType, T.DoubleType)):
        return 8
    if isinstance(dt, T.DecimalType):
        return dt.precision
    if isinstance(dt, (T.DateType, T.TimestampType, T.TimestampNTZType)):
        return 8
    return None


def decimal_digits(dt: T.DataType) -> int | None:
    """Fractional digits (SchemaHelper.getDecimalDigits, :161-169)."""
    if isinstance(dt, (T.BooleanType, T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return 0
    if isinstance(dt, T.FloatType):
        return 7
    if isinstance(dt, T.DoubleType):
        return 15
    if isinstance(dt, T.DecimalType):
        return dt.scale
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return 6
    return None


def num_prec_radix(dt: T.DataType) -> int | None:
    if isinstance(dt, T.NumericType):
        return 10
    return None
