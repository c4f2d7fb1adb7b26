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


# The driver verifies a bounded prefix of the registry each round (each
# CORRECTNESS_r{N}.json records rows for exactly the first 50 entries), so
# iteration order decides which queries get a hard driver-artifact
# correctness row.  Ordering is SELF-ROTATING: queries are sorted by the
# round in which they last received a driver row (never-verified first,
# then least-recently-verified), read from the CORRECTNESS_r*.json
# artifacts committed at the repo root.  Every query therefore cycles
# through the independently-verified prefix across rounds, and a newly
# added query jumps straight into the next round's window.


def _last_verified_round() -> dict[str, int]:
    """name -> latest round with a driver correctness row (from artifacts)."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    last: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for name in data:
            last[name] = max(last.get(name, 0), rnd)
    return last


# Queries ADDED or CHANGED this round: highest info value for the next
# driver window, so they sort ahead of everything (new code has never had
# an independent check; changed code has the highest regression risk).
_CHANGED_THIS_ROUND: set[str] = set()
# Since r09 this hand set is AUTO-DERIVED from git (queries/blast.py:
# changed kyuubi_spark modules since the last round boundary -> reverse
# import closure -> dependent registry names), unioned below.  Add names
# here only for semantic changes git can't see (e.g. a data contract
# shift with no module edit).


def all_queries() -> dict[str, QuerySpec]:
    # Import registrars for their side effects.
    from kyuubi_spark.queries import (  # noqa: F401
        analytics,
        gateway_queries,
        streaming_queries,
        pipeline,
        pipeline2,
        pipeline3,
        pipeline4,
        pipeline5,
        pipeline6,
        pipeline7,
        pipeline8,
        pipeline9,
        pipeline10,
        pipeline11,
        pipeline12,
        pipeline13,
        pipeline14,
        sql4,
        sqludf,
        tpcds,
        tpcds2,
        tpcds3,
        tpcds4,
        tpch,
    )

    last = _last_verified_round()
    names = list(REGISTRY)
    # Blast radius is AUTOMATIC since r09: the hand-maintained set is
    # unioned with every query whose builder module (or any kyuubi_spark
    # module it transitively imports) changed since the last round
    # boundary — a change to a shared helper promotes its dependents
    # into the next driver window without anyone remembering to list
    # them (queries/blast.py; tools/roundcheck.py verifies per round).
    changed = set(_CHANGED_THIS_ROUND)
    try:
        from kyuubi_spark.queries.blast import git_blast_radius

        changed |= git_blast_radius(REGISTRY)
    except Exception:
        pass  # no git / no boundary: the hand set still applies
    # added/changed-this-round first (new code + regression risk), then
    # never-verified (no driver row ever), then least-recently-verified.
    # Never-verified entries beyond the window rise automatically next
    # round once this round's window members receive their round stamp.
    ordered = sorted(
        range(len(names)),
        key=lambda i: (
            0 if names[i] in changed else 1,
            0 if last.get(names[i], -1) == -1 else 1,
            last.get(names[i], -1),
            i,
        ),
    )
    return {names[i]: REGISTRY[names[i]] for i in ordered}
