"""Formatted-explain parsing: the facts a plan review needs.

Works on `df._jdf.queryExecution().explainString("formatted")` (the same
text `.explain("formatted")` prints), which lists each scan's PushedFilters
and ReadSchema and names every exchange/join node.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    jqe = df._jdf.queryExecution()
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return jqe.explainString(mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters entry across the plan's file scans (flattened)."""
    text = explain_formatted(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", text):
        body = m.group(1).strip()
        if body:
            out.extend(s.strip() for s in body.split(","))
    return out


def scan_columns(df: DataFrame) -> list[set[str]]:
    """Per-scan column sets from ReadSchema — the pruning evidence."""
    text = explain_formatted(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", text):
        cols = {
            c.split(":")[0].strip()
            for c in m.group(1).split(",")
            if c.strip()
        }
        out.append(cols)
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (pre-AQE count —
    AQE may later coalesce but not add). Counts each node's detail block
    `(n) Exchange` once; BroadcastExchange is excluded (data movement, but
    not a shuffle)."""
    text = explain_formatted(df)
    return len(re.findall(r"(?m)^\(\d+\) Exchange\b", text))


def broadcast_join_count(df: DataFrame) -> int:
    text = explain_formatted(df)
    return len(
        re.findall(r"(?m)^\(\d+\) Broadcast(?:Hash|NestedLoop)Join\b", text)
    )


def sortmerge_join_count(df: DataFrame) -> int:
    return len(re.findall(r"(?m)^\(\d+\) SortMergeJoin\b", explain_formatted(df)))


def whole_stage_codegen_ids(df: DataFrame) -> set[int]:
    """Distinct codegen span ids (`[codegen id : N]` operator tags) — wider
    spans = more fused work. Under an un-executed AdaptiveSparkPlan the tags
    only appear once query stages materialize, so callers assessing codegen
    should disable AQE for the inspection pass."""
    return {
        int(m.group(1))
        for m in re.finditer(r"codegen id : (\d+)", explain_formatted(df))
    }


def plan_summary(df: DataFrame) -> dict:
    """One-call summary used by tests and tuning sessions."""
    return {
        "pushed_filters": pushed_filters(df),
        "scan_columns": [sorted(s) for s in scan_columns(df)],
        "exchanges": exchange_count(df),
        "broadcast_joins": broadcast_join_count(df),
        "sortmerge_joins": sortmerge_join_count(df),
        "codegen_stages": len(whole_stage_codegen_ids(df)),
    }
