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


# The r13/r14 optimization-round rewrites, most of which rotated OUT of
# the driver's 50-query oracle sample in r13 (VERDICT r13 Next #7): pin
# them at sf0.01 — a 10x-coarser grid than the default sf0.001 run —
# so a rewrite that only breaks with more data (bucket collisions,
# broadcast-gate flips, slice boundaries) cannot ship green.
REWRITTEN_R13_R14 = [
    "ivf_nprobe_sweep",
    "pinball_quantile_grid",
    "kcore_peel_rounds",
    "bfs_reachability_hops",
    "rich_club_coefficient",
    "xml_extract",
    "dsir_importance_weights",
    "stream_dsir_filter",
    "stream_dsir_filter_update",
    "dedup_simhash",
    "dedup_minhash_lsh",
    "dedup_components",
    "dedup_survivors",
    "dedup_token_savings",
    "dedup_cluster_stats",
    "incremental_dedup",
    "forget_closure",
    "dedup_lsh_recall_report",
    "lsh_banding_sweep",
    "stream_refresh_neardup",
    "stream_transition_counts_ttl",
    "formats_roundtrip",
]


_SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck_sf01():
    import duckdb

    from tools.verify import TABLES

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(_SF01, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    yield con
    con.close()


@pytest.mark.parametrize("name", REWRITTEN_R13_R14)
def test_rewrite_matches_oracle_sf001(spark, duck_sf01, name):
    if not os.path.isdir(_SF01):
        pytest.skip("sf0.01 testdata not present")
    spec = all_queries()[name]
    ok, detail = compare(spark, duck_sf01, spec, _SF01)
    assert ok, f"{name}@sf0.01: {detail}"
