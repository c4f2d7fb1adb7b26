"""Query registry — every verified operator gets a (builder, oracle) pair.

The driver contract (``__spark_entry__.py``) needs, per query name:
  - a callable ``(spark, sf_dir) -> DataFrame`` (the Spark-first plan), and
  - an ANSI-SQL string DuckDB can run on the same parquet views (the oracle).

Parity rule: aliases must match exactly between both sides (the driver sorts
columns by name before value-hashing), and any float aggregate is rounded on
BOTH sides so cross-engine summation order can't flip the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB-compatible SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, doc: str = ""):
    """Register a query under ``name``; used as a decorator."""

    def deco(fn):
        REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    # Import registrars for their side effects.
    from kyuubi_spark.queries import (  # noqa: F401
        analytics,
        gateway_queries,
        streaming_queries,
        pipeline,
        tpch,
    )

    return dict(REGISTRY)
