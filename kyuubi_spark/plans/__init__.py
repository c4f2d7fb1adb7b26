"""Physical-plan introspection and plan-quality assertions.

The reference exposes plan stages through PlanOnlyStatement; beyond that,
our build adds plan *quality* checks used by tests and the watchdog:
parse the formatted explain output for pushed filters, scan-level column
pruning, broadcast vs shuffle joins, and exchange counts. These are the
properties that decide 100 TB behavior — a missing pushdown or an extra
shuffle is invisible at sf0.01 and fatal at scale, so the test suite pins
them (tests/test_plan_quality.py).
"""

from kyuubi_spark.plans.introspect import (
    broadcast_join_count,
    exchange_count,
    explain_formatted,
    plan_summary,
    pushed_filters,
    scan_columns,
    whole_stage_codegen_ids,
)

__all__ = [
    "broadcast_join_count",
    "exchange_count",
    "explain_formatted",
    "plan_summary",
    "pushed_filters",
    "scan_columns",
    "whole_stage_codegen_ids",
]
