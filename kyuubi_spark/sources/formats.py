"""Multi-format table IO with schema round-trip guarantees.

Notes per format:
- parquet: the engine's native format (statistics, predicate pushdown,
  column pruning). Default everywhere.
- orc: equal capability; the reference spills results as zstd ORC
  (ExecuteStatement.scala:190-194) — `write_spill` mirrors that choice.
- csv/json: schemaless text formats; `read_csv`/`read_json` take the
  authoritative schema (inference is a driver-side extra pass — never at
  100 TB) and apply it explicitly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SCALAR_ONLY = (T.ArrayType, T.MapType, T.StructType)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).parquet(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    options.setdefault("compression", "zstd")
    df.write.mode(mode).options(**options).orc(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    """CSV cannot carry nested types; fail fast instead of silently
    stringifying (a 100 TB export with corrupted arrays is unrecoverable)."""
    nested = [f.name for f in df.schema.fields if isinstance(f.dataType, SCALAR_ONLY)]
    if nested:
        raise ValueError(f"CSV cannot represent nested columns: {nested}")
    options.setdefault("header", "true")
    df.write.mode(mode).options(**options).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite", **options) -> None:
    df.write.mode(mode).options(**options).json(path)


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType, **options) -> DataFrame:
    options.setdefault("header", "true")
    return spark.read.options(**options).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: T.StructType, **options) -> DataFrame:
    return spark.read.options(**options).schema(schema).json(path)


WRITERS = {
    "parquet": write_parquet,
    "orc": write_orc,
    "csv": write_csv,
    "json": write_json,
}
