"""Driver-gate mirror: every registry query vs its DuckDB oracle at sf0.001.

Mirrors the reference's golden-file strategy (kyuubi TPCHQuerySuite.scala:45-71
asserts schema + sum(hash(*)) per query); here the 'golden' is DuckDB run live
on the same parquet.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kyuubi_spark.queries import all_queries  # noqa: E402
from tools.verify import compare  # noqa: E402

QUERY_NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = all_queries()[name]
    ok, detail = compare(spark, duck, spec, sf_dir)
    assert ok, f"{name}: {detail}"
