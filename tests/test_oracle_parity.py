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
from tools.verify import compare, lint_oracle  # noqa: E402

QUERY_NAMES = sorted(all_queries())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    spec = all_queries()[name]
    ok, detail = compare(spark, duck, spec, sf_dir)
    assert ok, f"{name}: {detail}"


def test_no_oracle_surfaces_wide_integers(duck):
    """No oracle may surface an uncast HUGEINT aggregate.

    DuckDB types bare SUM(<integer>) as HUGEINT while Spark stays BIGINT;
    the driver's value-hash is type-sensitive, so such a column fails
    hash_match even with identical values.  This bug class shipped in r01
    and again in r03 — the lint makes a third shipment impossible.
    """
    offenders = {}
    for name, spec in all_queries().items():
        if spec.oracle is None:
            continue
        hits = lint_oracle(duck, spec.oracle)
        if hits:
            offenders[name] = hits
    assert not offenders, (
        f"oracles surfacing uncast wide-integer columns (wrap in "
        f"CAST(... AS BIGINT)): {offenders}"
    )
