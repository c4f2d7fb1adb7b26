"""Deterministic NL→tool-call planner for the data-agent operation.

The reference's kyuubi-data-agent-engine drives an LLM provider through
ProviderRunRequest and streams the conversation back as agent events
(externals/kyuubi-data-agent-engine/.../operation/ExecuteStatement
.scala:33-140).  No model ships in this container, so THIS planner is the
deterministic stand-in: rule-based natural-language parsing that runs the
same multi-turn shape a real agent does —

    schema lookup (tool call) → SQL draft grounded in the ACTUAL columns
    → execute (approval-gated tool call) → summarize

Swapping it for an LLM changes only how the Intent and draft are
produced; the event protocol, approval handshake, and tools are shared
with agent.py unchanged.

Understood task forms (case-insensitive):

    how many rows are in <table>            → COUNT(*)
    average <col> in <table> [by <group>]   → AVG aggregate
    total <col> in <table> [by <group>]     → SUM aggregate
    top <n> <table> by <col>                → ORDER BY col DESC LIMIT n
    what columns does <table> have          → DESCRIBE

Column references are resolved case-insensitively against the schema the
first tool call fetched; an unknown column fails the plan with the
schema's real column names in the error (the grounding an LLM gets from
its schema-lookup tool result).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class Intent:
    kind: str  # count | avg_by | sum_by | top_n | describe
    table: str
    column: str | None = None
    group: str | None = None
    n: int | None = None


_NL_PATTERNS: list[tuple[re.Pattern, callable]] = [
    (
        re.compile(
            r"^\s*how\s+many\s+(?:rows|records|entries)\s+(?:are\s+)?"
            r"(?:in|does)\s+(\w+)\s*\??\s*$",
            re.IGNORECASE,
        ),
        lambda m: Intent("count", m.group(1)),
    ),
    (
        re.compile(
            r"^\s*(?:average|mean)\s+(?:of\s+)?(\w+)\s+(?:in|of|from)\s+"
            r"(\w+)(?:\s+by\s+(\w+))?\s*\??\s*$",
            re.IGNORECASE,
        ),
        lambda m: Intent("avg_by", m.group(2), column=m.group(1),
                         group=m.group(3)),
    ),
    (
        re.compile(
            r"^\s*(?:total|sum)\s+(?:of\s+)?(\w+)\s+(?:in|of|from)\s+"
            r"(\w+)(?:\s+by\s+(\w+))?\s*\??\s*$",
            re.IGNORECASE,
        ),
        lambda m: Intent("sum_by", m.group(2), column=m.group(1),
                         group=m.group(3)),
    ),
    (
        re.compile(
            r"^\s*top\s+(\d+)\s+(\w+)\s+by\s+(\w+)\s*\??\s*$", re.IGNORECASE
        ),
        lambda m: Intent("top_n", m.group(2), column=m.group(3),
                         n=int(m.group(1))),
    ),
    (
        re.compile(
            r"^\s*what\s+columns\s+does\s+(\w+)\s+have\s*\??\s*$",
            re.IGNORECASE,
        ),
        lambda m: Intent("describe", m.group(1)),
    ),
]


def parse_nl(task: str) -> Intent | None:
    """Rule-based NL parse; None when no pattern matches (the caller
    falls back to the direct command forms)."""
    for pattern, build in _NL_PATTERNS:
        m = pattern.match(task)
        if m:
            return build(m)
    return None


def resolve_column(name: str, columns: list[tuple[str, str]]) -> str:
    """Ground a task's column reference in the fetched schema
    (case-insensitive); unknown names fail with the real columns listed."""
    for col, _dtype in columns:
        if col.lower() == name.lower():
            return col
    raise ValueError(
        f"column {name!r} not in table schema; available: "
        f"{[c for c, _ in columns]}"
    )


def draft_sql(intent: Intent, columns: list[tuple[str, str]]) -> tuple[str, str]:
    """(reasoning, sql) grounded in the schema-lookup result."""
    t = intent.table
    if intent.kind == "count":
        return (
            f"The task asks for the row count of {t}; COUNT(*) answers it.",
            f"SELECT COUNT(*) AS n FROM {t}",
        )
    if intent.kind in ("avg_by", "sum_by"):
        fn = "AVG" if intent.kind == "avg_by" else "SUM"
        col = resolve_column(intent.column, columns)
        if intent.group:
            grp = resolve_column(intent.group, columns)
            return (
                f"The task asks for the {fn.lower()} of {t}.{col} per "
                f"{grp}; both columns exist in the schema, so one "
                "grouped aggregate answers it.",
                f"SELECT {grp}, {fn}({col}) AS {fn.lower()}_{col} "
                f"FROM {t} GROUP BY {grp} ORDER BY {grp}",
            )
        return (
            f"The task asks for the {fn.lower()} of {t}.{col}; the column "
            "exists in the schema, so one aggregate answers it.",
            f"SELECT {fn}({col}) AS {fn.lower()}_{col} FROM {t}",
        )
    if intent.kind == "top_n":
        col = resolve_column(intent.column, columns)
        return (
            f"The task asks for the top {intent.n} rows of {t} ranked by "
            f"{col}; ORDER BY ... DESC LIMIT answers it.",
            f"SELECT * FROM {t} ORDER BY {col} DESC LIMIT {intent.n}",
        )
    if intent.kind == "describe":
        return (
            f"The schema tool call already fetched {t}'s columns; "
            "rendering them as the result.",
            f"DESCRIBE {t}",
        )
    raise ValueError(f"unknown intent kind {intent.kind!r}")


def summarize(intent: Intent, rows: list) -> str:
    """Deterministic result digest — the final 'assistant' turn."""
    if intent.kind == "count" and rows:
        return f"{intent.table} has {rows[0][0]} rows."
    if intent.kind in ("avg_by", "sum_by") and rows and not intent.group:
        word = "average" if intent.kind == "avg_by" else "total"
        return (
            f"The {word} {intent.column} in {intent.table} is {rows[0][0]}."
        )
    if intent.kind in ("avg_by", "sum_by"):
        return (
            f"Computed per-{intent.group} aggregates of "
            f"{intent.table}.{intent.column}: {len(rows)} groups."
        )
    if intent.kind == "top_n":
        return (
            f"Found the top {len(rows)} rows of {intent.table} by "
            f"{intent.column}."
        )
    return f"{intent.table}: {len(rows)} result rows."
