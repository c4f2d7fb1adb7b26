"""Golden schema+hash corpus check (reference TPCHQuerySuite.scala:45-71
strategy: every TPC query's result schema and content hash are checked in;
a mismatch means the RESULT drifted, independent of the DuckDB oracles).

Regenerate after an intentional change: python tools/gen_goldens.py
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.queries import all_queries  # noqa: E402
from tools.gen_goldens import result_fingerprint  # noqa: E402

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
SF_DIR = "/root/testdata/sf0.001"


def _golden_names():
    if not os.path.isdir(GOLDEN_DIR):
        return []
    return sorted(n[:-5] for n in os.listdir(GOLDEN_DIR) if n.endswith(".json"))


def test_goldens_cover_the_tpc_corpus():
    names = set(_golden_names())
    registry = {
        n for n in all_queries() if n.startswith("tpch_") or n.startswith("tpcds_q")
    }
    assert registry <= names, f"missing goldens: {sorted(registry - names)}"


@pytest.mark.parametrize("name", _golden_names())
def test_golden_matches(spark, name):
    with open(os.path.join(GOLDEN_DIR, f"{name}.json")) as f:
        want = json.load(f)
    spec = all_queries().get(name)
    assert spec is not None, f"golden {name} has no registry entry"
    got = result_fingerprint(spec.builder(spark, SF_DIR))
    assert got == want, f"{name}: result drifted from golden"
