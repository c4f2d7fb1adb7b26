"""Row-filter and column-masking authorization via view substitution.

Counterpart of the reference authz rules (extensions/spark/kyuubi-spark-
authz/.../rule/rowfilter/RuleApplyRowFilter.scala and
datamasking/RuleApplyDataMaskingStage0.scala — Catalyst resolution rules
that wrap table scans with policy predicates / replace output columns with
masking expressions). PySpark has no resolution-rule injection point, so we
use the mechanism the reference docs themselves describe as the equivalent:
replace the table binding with a policy-applying temp view
(SURVEY.md §2.G "inject WHERE via view substitution").

Policies are plain data (table → filter SQL, column → mask SQL), the shape
Ranger policies reduce to after evaluation.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import SparkSession


@dataclass
class TablePolicy:
    """Evaluated access policy for one table."""

    row_filter: str | None = None  # SQL boolean expr over the table's columns
    column_masks: dict[str, str] = field(default_factory=dict)  # col → SQL expr


# Built-in mask expressions, mirroring Ranger's standard mask types
# (MASK, MASK_SHOW_LAST_4, MASK_HASH, MASK_NULL).
def mask_full(col: str) -> str:
    return f"regexp_replace(regexp_replace(regexp_replace(CAST({col} AS STRING), '[A-Z]', 'X'), '[a-z]', 'x'), '[0-9]', 'n')"


def mask_show_last_4(col: str) -> str:
    # right() rather than negative substr: identical in Spark and ANSI oracles
    return (
        f"CASE WHEN length(CAST({col} AS STRING)) <= 4 THEN CAST({col} AS STRING) "
        f"ELSE concat(repeat('x', length(CAST({col} AS STRING)) - 4), "
        f"right(CAST({col} AS STRING), 4)) END"
    )


def mask_hash(col: str) -> str:
    return f"md5(CAST({col} AS STRING))"


def mask_null(col: str) -> str:  # noqa: ARG001 - signature parity
    return "CAST(NULL AS STRING)"


def apply_policies(
    spark: SparkSession, policies: dict[str, TablePolicy], suffix: str = "_secured"
) -> dict[str, str]:
    """Create policy-applying temp views; returns {table: secured_view}.

    Each secured view selects every column (masked where required) and
    applies the row filter. Re-pointing a session's queries at the secured
    views gives the same result the reference's injected rules produce.
    Masks/filters are ordinary Catalyst expressions — pushdown through the
    view works as usual (filters still reach the scan).
    """
    out = {}
    for table, pol in policies.items():
        cols = []
        for f in spark.table(table).schema.fields:
            if f.name in pol.column_masks:
                cols.append(f"{pol.column_masks[f.name]} AS {f.name}")
            else:
                cols.append(f.name)
        where = f" WHERE {pol.row_filter}" if pol.row_filter else ""
        view = f"{table}{suffix}"
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY VIEW {view} AS "
            f"SELECT {', '.join(cols)} FROM {table}{where}"
        )
        out[table] = view
    return out
