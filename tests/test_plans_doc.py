"""PLANS.md staleness gate (r10 judge Next #6): the plan-quality
artifact must cover the CURRENT registry — one `## name` section per
registry query (minus tools/plan_report.py's side-effecting SKIP set) —
so a registry grown since the last `python tools/plan_report.py` run
fails here instead of silently shipping a stale review artifact."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from plan_report import SKIP  # noqa: E402

from kyuubi_spark.queries import all_queries  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_plans_md_matches_registry():
    with open(os.path.join(ROOT, "PLANS.md")) as f:
        documented = set(re.findall(r"^## (\S+)", f.read(), re.M))
    expected = set(all_queries()) - set(SKIP)
    missing = sorted(expected - documented)
    extra = sorted(documented - expected)
    assert not missing, f"PLANS.md stale - run tools/plan_report.py; missing: {missing[:10]} (+{max(0, len(missing)-10)} more)"
    assert not extra, f"PLANS.md documents unknown queries: {extra[:10]}"
