"""Plan-quality gate: the physical properties that decide 100 TB behavior.

Each assertion pins something invisible at sf0.001 and fatal at scale:
filters reaching the parquet scan, scans pruned to referenced columns,
fixed-size dimensions broadcast (never shuffled), and text/dedup operators
staying map-only (no Python UDFs / no surprise shuffles).
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kyuubi_spark import plans  # noqa: E402
from kyuubi_spark.queries import all_queries  # noqa: E402


def _build(spark, sf_dir, name):
    return all_queries()[name].builder(spark, sf_dir)


def test_q6_filters_pushed_to_scan(spark, sf_dir):
    df = _build(spark, sf_dir, "tpch_q6")
    pf = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pf and "l_discount" in pf and "l_quantity" in pf


def test_q6_scan_prunes_columns(spark, sf_dir):
    df = _build(spark, sf_dir, "tpch_q6")
    (cols,) = plans.scan_columns(df)
    # 4 referenced columns only — not all 16 lineitem columns
    assert cols == {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"}


def test_q1_single_shuffle(spark, sf_dir):
    # one grouped aggregate → exactly one exchange (partial+final combine)
    df = _build(spark, sf_dir, "tpch_q1")
    assert plans.exchange_count(df) == 1


def test_q5_broadcasts_fixed_dims(spark, sf_dir):
    # region (5 rows) and nation (25 rows) must be broadcast at EVERY scale
    df = _build(spark, sf_dir, "tpch_q5")
    assert plans.broadcast_join_count(df) >= 2


def test_q3_join_filters_pushed(spark, sf_dir):
    df = _build(spark, sf_dir, "tpch_q3")
    pf = " ".join(plans.pushed_filters(df))
    assert "c_mktsegment" in pf and "o_orderdate" in pf and "l_shipdate" in pf


def test_text_stats_is_map_only(spark, sf_dir):
    # pure per-row Column expressions: no exchange at all before the sort
    df = all_queries()["text_stats"].builder(spark, sf_dir)
    summary = plans.plan_summary(df)
    # the only exchange allowed is the final orderBy's range partitioning
    assert summary["exchanges"] <= 1
    assert "BatchEvalPython" not in plans.explain_formatted(df)


def test_no_python_udfs_in_relational_queries(spark, sf_dir):
    # the hot path stays JVM-side for every TPC-H query
    for name in ["tpch_q1", "tpch_q9", "tpch_q18"]:
        text = plans.explain_formatted(all_queries()[name].builder(spark, sf_dir))
        assert "BatchEvalPython" not in text, f"{name} fell back to Python UDF"
        assert "ArrowEvalPython" not in text, f"{name} uses pandas UDF on hot path"
    # dedup shingling is Arrow-batched by design (higher-order array lambdas
    # are interpreted, not codegen'd — the vectorized pandas form is 3x
    # faster and stays map-only); row-at-a-time Python remains forbidden
    text = plans.explain_formatted(
        all_queries()["dedup_minhash_lsh"].builder(spark, sf_dir)
    )
    assert "BatchEvalPython" not in text


def test_codegen_covers_aggregate(spark, sf_dir):
    # codegen tags only render for non-adaptive (or materialized) plans;
    # build the aggregate from a raw read because load_table re-enables AQE
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        df = (
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
            .filter(F.col("l_quantity") < 30)
            .groupBy("l_returnflag")
            .agg(F.sum("l_extendedprice").alias("s"))
        )
        ids = plans.whole_stage_codegen_ids(df)
        assert len(ids) >= 1
        # scan+filter+partial-agg must fuse into one span (the hot loop)
        text = plans.explain_formatted(df)
        assert "Scan parquet" in text
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")


def test_tpcds_q47_single_fact_scan(spark, sf_dir):
    """LAG/LEAD formulation must not recompute the grouped series: exactly
    one lineitem scan (the rn±1 self-join form had three)."""
    df = _build(spark, sf_dir, "tpcds_q47")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("lineitem.parquet") == 1
    assert plans.exchange_count(df) <= 5


def test_tpcds_q7_star_join_broadcasts(spark, sf_dir):
    df = _build(spark, sf_dir, "tpcds_q7")
    # dimensions (part/customer/orders-filter) resolve as broadcast joins,
    # never as shuffles of the fact table per dim
    assert plans.broadcast_join_count(df) >= 2


def test_tpcds_q22_rollup_pushes_date_filter(spark, sf_dir):
    df = _build(spark, sf_dir, "tpcds_q22")
    pf = " ".join(plans.pushed_filters(df))
    assert "l_shipdate" in pf


def test_jaccard_exact_joins_only_prefixes(spark, sf_dir):
    """Prefix filtering: the candidate self-join must read the ranked
    prefix relation, not the full shingle relation (the quadratic-blowup
    shape at scale is a raw shingle self-join)."""
    df = _build(spark, sf_dir, "dedup_ngram_jaccard")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # prefix length appears as the rank filter over the frequency order
    assert "pref_len" in plan or "row_number" in plan.lower()


def test_sequence_packing_windows_are_sharded(spark, sf_dir):
    df = _build(spark, sf_dir, "sequence_packing")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # the window partition spec must include the shard column, so no
    # partition spans a whole source
    assert "shard" in plan


def test_tpcds_single_pass_rewrites_scan_once(spark, sf_dir):
    """q2/q11/q38/q51 replace CTE re-instantiation, INTERSECT chains, and
    full-outer channel alignment with conditional aggregation — each must
    read the fact table exactly once (the oracles keep the literal spec
    structure and prove value equivalence)."""
    for name in ["tpcds_q2", "tpcds_q11", "tpcds_q38", "tpcds_q51"]:
        df = _build(spark, sf_dir, name)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("lineitem.parquet") == 1, name


def test_new_tpcds_single_pass_rewrites_scan_once(spark, sf_dir):
    """q9 (15 scalar subqueries), q31 (six-way CTE self-join), q43/q59
    (day-of-week pivots) are rewritten as conditional aggregation — each
    must read the fact exactly once."""
    for name in ["tpcds_q9", "tpcds_q31", "tpcds_q43", "tpcds_q59"]:
        df = _build(spark, sf_dir, name)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert plan.count("lineitem.parquet") == 1, name


def test_tpcds_q6_expensive_items_broadcast_semi(spark, sf_dir):
    """The decorrelated >1.03x-category-average item set must reach the
    fact as a broadcast semi-join, not a shuffle."""
    df = _build(spark, sf_dir, "tpcds_q6")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_tpcds_q95_no_quadratic_order_self_join(spark, sf_dir):
    """Multi-supplier orders come from a count-distinct aggregate, not the
    spec's order self-join — no lineitem x lineitem pair blowup."""
    df = _build(spark, sf_dir, "tpcds_q95")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    # multi-supplier set = per-order distinct-supplier count, no self-join
    assert "count(distinct l_suppkey" in plan
    # and the two IN predicates resolve as semi-joins
    assert plan.count("Join LeftSemi") >= 2


def test_pii_redact_is_map_only(spark, sf_dir):
    df = _build(spark, sf_dir, "pii_detect_redact")
    summary = plans.plan_summary(df)
    assert summary["exchanges"] <= 1  # only the final orderBy range exchange
    assert "BatchEvalPython" not in plans.explain_formatted(df)


def test_line_dedup_pushes_count_join_not_cartesian(spark, sf_dir):
    df = _build(spark, sf_dir, "text_line_dedup")
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text
    assert "BatchEvalPython" not in text


def test_gap_fill_spine_is_broadcast(spark, sf_dir):
    """The generated hours x types spine must broadcast against the hourly
    rollup (tiny at any SF) — the only data shuffle is the rollup group-by
    plus the window/order exchanges."""
    df = _build(spark, sf_dir, "ts_gap_fill")
    assert plans.broadcast_join_count(df) >= 1


# ---- round-3 operators: physical properties of the new plans ----


def test_tpcds_date_filters_push_to_scan(spark, sf_dir):
    # year-filter rewrite: both range bounds must reach the parquet scan
    for name in ("tpcds_q18", "tpcds_q50", "tpcds_q75"):
        df = _build(spark, sf_dir, name)
        pf = " ".join(plans.pushed_filters(df))
        assert "GreaterThanOrEqual(l_shipdate" in pf, name
        assert "LessThan(l_shipdate" in pf, name


def test_tpcds_q66_pivot_single_fact_shuffle(spark, sf_dir):
    # 24 conditional aggregates combine map-side: one grouped exchange
    # (+ the final orderBy range exchange), dims broadcast
    df = _build(spark, sf_dir, "tpcds_q66")
    assert plans.exchange_count(df) <= 2
    assert plans.broadcast_join_count(df) >= 2


def test_tpcds_q23_qualifiers_broadcast(spark, sf_dir):
    # frequent-items and best-customers sets must join as broadcasts,
    # never shuffling the fact table for the semi joins
    df = _build(spark, sf_dir, "tpcds_q23")
    assert plans.broadcast_join_count(df) >= 2


def test_mixture_sample_corpus_never_shuffled(spark, sf_dir):
    # the per-language rate table aggregates (tiny: one row per language —
    # its exchanges are O(languages), not O(corpus)) and joins back as a
    # broadcast; the corpus scan itself must reach the filter through
    # broadcast joins only, never a sort-merge shuffle
    df = _build(spark, sf_dir, "mixture_sample_temperature")
    summary = plans.plan_summary(df)
    assert summary["broadcast_joins"] >= 2
    assert summary["sortmerge_joins"] == 0


def test_bloom_probe_broadcasts_filter(spark, sf_dir):
    # the word->bits filter is broadcast; no shuffle of the corpus except
    # the per-doc and per-source aggregations
    df = _build(spark, sf_dir, "bloom_decontaminate")
    assert plans.broadcast_join_count(df) >= 1
    assert "CartesianProduct" not in plans.explain_formatted(df)


def test_tpcds_q23_topk_is_distributed(spark, sf_dir):
    # the best-customers qualifier must plan as a distributed top-k
    # (TakeOrderedAndProject: per-partition heap + driver merge), never a
    # global ROW_NUMBER window that shuffles every customer to one task
    df = _build(spark, sf_dir, "tpcds_q23")
    text = plans.explain_formatted(df)
    assert "TakeOrderedAndProject" in text
    assert "Window" not in text, "q23 regressed to a global window top-k"


def test_tpcds_q44_topk_is_distributed(spark, sf_dir):
    # both ranking directions take their top-10 via TakeOrderedAndProject;
    # ROW_NUMBER is applied only to the surviving <=10 rows, so the
    # remaining Window nodes are bounded, not full-relation sorts
    import re

    df = _build(spark, sf_dir, "tpcds_q44")
    text = plans.explain_formatted(df)
    windows = re.findall(r"Window \(\d+\)\n(.*)\n", text)
    assert windows, "expected the two bounded rank windows"
    for child_line in windows:
        assert "TakeOrderedAndProject" in child_line, (
            "a Window consumes an unlimited input — q44 regressed to a "
            f"full-relation global sort: {child_line!r}"
        )


def test_tpcds_q64_megajoin_shape(spark, sf_dir):
    # the widest join graph in the corpus: returns pairing is an equi-join
    # on (orderkey, partkey), every dimension is broadcast, the cs_ui
    # qualifier reaches the fact scan as a broadcast semi join — no
    # cartesian / nested-loop anywhere
    df = _build(spark, sf_dir, "tpcds_q64")
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    assert plans.broadcast_join_count(df) >= 4


def test_tpcds_q23b_topk_is_distributed(spark, sf_dir):
    # both top-k cuts (best customers, final top-100) must be
    # TakeOrderedAndProject, never a global window
    df = _build(spark, sf_dir, "tpcds_q23b")
    text = plans.explain_formatted(df)
    assert "TakeOrderedAndProject" in text
    assert "Window" not in text


def test_winnowing_no_cartesian(spark, sf_dir):
    # fingerprint matching is an equi-join on the inverted index — an
    # all-pairs/cartesian plan would be quadratic at scale
    df = _build(spark, sf_dir, "winnowing_overlap")
    assert "CartesianProduct" not in plans.explain_formatted(df)
    assert "BroadcastNestedLoopJoin" not in plans.explain_formatted(df)


def test_repeated_ngram_no_cartesian_and_pruned_scan(spark, sf_dir):
    # the gram-frequency join must be an equi-join on the gram key (a
    # cartesian/all-pairs plan goes quadratic at corpus scale), and the
    # shard-shuffle scan must prune to its two referenced columns
    df = _build(spark, sf_dir, "repeated_ngram_coverage")
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    shard = _build(spark, sf_dir, "corpus_shard_shuffle")
    (cols,) = plans.scan_columns(shard)
    assert cols == {"doc_id", "n_chars"}  # text column never read


def test_tpcds_b_variants_broadcast_dims(spark, sf_dir):
    # the a/b second shapes keep the a-variants' physical discipline:
    # qualifier sets and dimensions broadcast, no cartesian anywhere
    for name in ["tpcds_q14b", "tpcds_q39b"]:
        df = _build(spark, sf_dir, name)
        text = plans.explain_formatted(df)
        assert "CartesianProduct" not in text, name
        assert plans.broadcast_join_count(df) >= 2, name


def _window_is_partitioned(spec: str) -> bool:
    """A windowspecdefinition's arguments are partition columns (bare),
    then sort orders (with ASC/DESC), then the frame: the window is
    partitioned iff the FIRST argument is a bare column."""
    inner = spec.split("windowspecdefinition(", 1)[1]
    first = inner.split(",", 1)[0].strip()
    return (
        "specifiedwindowframe" not in first
        and " ASC" not in first
        and " DESC" not in first
    )


def _assert_all_windows_partitioned(text, name):
    """Every Window node must carry a non-empty partition spec — a bare
    Window.orderBy ships the whole (data-scaled) relation to ONE task."""
    import re

    for m in re.finditer(r"\(\d+\) Window\b[\s\S]*?Arguments: (.+)", text):
        args = m.group(1)
        if "windowspecdefinition(" not in args:
            continue
        assert _window_is_partitioned(args), (
            f"{name}: unpartitioned (single-partition) Window: {args[:160]}"
        )


def test_win_distribution_no_global_window(spark, sf_dir):
    # ntile/percent_rank/cume_dist over the per-user spend relation must
    # come from the two-phase distributed ranker (operators/ranking.py),
    # never a bare Window.orderBy over user cardinality
    df = _build(spark, sf_dir, "win_distribution")
    _assert_all_windows_partitioned(plans.explain_formatted(df), "win_distribution")


def test_rfm_segments_no_global_window(spark, sf_dir):
    # the three NTILE axes are chained distributed rankings — all Window
    # nodes partitioned by the range bucket
    df = _build(spark, sf_dir, "rfm_segments")
    _assert_all_windows_partitioned(plans.explain_formatted(df), "rfm_segments")


def test_tpcds_q49_no_status_partitioned_window(spark, sf_dir):
    # per-status ranks come from the distributed ranker over the composite
    # (status, ratio, item) order — a Window.partitionBy(status) would put
    # item-cardinality rows on just 3 tasks at scale
    df = _build(spark, sf_dir, "tpcds_q49")
    text = plans.explain_formatted(df)
    _assert_all_windows_partitioned(text, "tpcds_q49")
    import re

    for m in re.finditer(r"\(\d+\) Window\b[\s\S]*?Arguments: (.+)", text):
        args = m.group(1)
        if "windowspecdefinition(" not in args:
            continue
        first = args.split("windowspecdefinition(", 1)[1].split(",", 1)[0]
        assert "status" not in first, (
            "q49 window partitioned by the 3-value status column again"
        )


@pytest.mark.parametrize(
    "name,min_bcast",
    [
        ("tpcds_q46", 2),
        ("tpcds_q72", 3),
        ("tpcds_q79", 2),
        ("tpcds_q84", 2),
        ("tpcds_q85", 2),
    ],
)
def test_new_tpcds_ports_star_join_shape(spark, sf_dir, name, min_bcast):
    # the round-6 ports: every dimension side broadcast, returns pairing /
    # inventory pairing are equi-joins — no cartesian or nested-loop scan
    df = _build(spark, sf_dir, name)
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text, name
    assert plans.broadcast_join_count(df) >= min_bcast, name
    assert "BroadcastNestedLoopJoin" not in text, name


def test_tpcds_q24_ssales_star_and_scalar_threshold(spark, sf_dir):
    # the final q24 plan truncates at the shared localCheckpoint, so the
    # star shape is asserted on the ssales CTE relation itself; the only
    # nested-loop in the full query is the sanctioned 1-row threshold
    # cross join
    from kyuubi_spark.queries.tpcds4 import _ssales

    ss = _ssales(spark, sf_dir)
    text = plans.explain_formatted(ss)
    assert "CartesianProduct" not in text
    assert plans.broadcast_join_count(ss) >= 4
    assert "BroadcastNestedLoopJoin" not in text
    full = plans.explain_formatted(_build(spark, sf_dir, "tpcds_q24a"))
    assert "CartesianProduct" not in full
    assert full.count("BroadcastNestedLoopJoin") <= 2  # node + detail entry


def test_exact_substring_spans_doc_partitioned_window(spark, sf_dir):
    # the gaps-and-islands merge windows PARTITION BY doc_id (per-doc
    # gram count is doc-length-bounded, never corpus-scaled) and the
    # gram join is an equi-join — no cartesian anywhere
    df = _build(spark, sf_dir, "exact_substring_spans")
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text
    assert "BroadcastNestedLoopJoin" not in text
    _assert_all_windows_partitioned(text, "exact_substring_spans")


def test_gopher_quality_report_map_only_rules(spark, sf_dir):
    # all four Gopher rules are column expressions: the only shuffles are
    # the bounded per-source aggregate and the final |sources|-row sort
    df = _build(spark, sf_dir, "gopher_quality_report")
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text
    assert "BatchEvalPython" not in text and "ArrowEvalPython" not in text
    assert plans.exchange_count(df) <= 3


def test_vocab_coverage_rank_is_distributed(spark, sf_dir):
    # the vocab-scaled global rank runs on the two-phase ranker (windows
    # partitioned by range bucket); the ONLY unpartitioned window is the
    # cumulative over <= ~40 log2-rank bucket rows (window_audit
    # allowlist), and the corpus total joins in as a broadcast scalar
    df = _build(spark, sf_dir, "vocab_coverage_report")
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text
    unpart = [
        ln
        for ln in text.splitlines()
        if "windowspecdefinition(" in ln and not _window_is_partitioned(ln)
    ]
    for ln in unpart:
        assert "bucket_start" in ln, f"unexpected global window: {ln[:160]}"


def test_bpe_merge_pairs_distributed_topk(spark, sf_dir):
    # the top-k cut must be TakeOrdered (per-partition heads + bounded
    # merge), never a global Sort feeding a CollectLimit
    df = _build(spark, sf_dir, "bpe_merge_pair_counts")
    text = plans.explain_formatted(df)
    assert "TakeOrderedAndProject" in text
    assert "CartesianProduct" not in text


def test_source_unigram_kl_broadcast_total(spark, sf_dir):
    # the 1-row corpus total joins in as a broadcast; the token join is
    # an equi-join; no window anywhere
    df = _build(spark, sf_dir, "source_unigram_kl")
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text
    assert "windowspecdefinition" not in text
    assert plans.broadcast_join_count(df) >= 1 or "BroadcastNestedLoop" in text


def test_semdedup_sweep_cluster_scoped_no_all_pairs(spark, sf_dir):
    # the sweep drives semantic_dedup's CLUSTER-SCOPED scorer (O(n^2/k)),
    # not a full-corpus all-pairs pass: the only pair generation is the
    # FlatMapGroupsInPandas keyed on cluster id, the embeddings parquet is
    # scanned once in the final plan (centroids were collected eagerly at
    # build), the 8-row threshold relation joins as a broadcast, and
    # distinct-doc counts come from explode+countDistinct, never a
    # per-group collect_list buffer
    df = _build(spark, sf_dir, "semdedup_threshold_sweep")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "collect_list" not in plan
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text
    # exactly one scorer invocation, one embeddings scan: no all-pairs
    # self-join and no per-branch re-scoring (count on the optimized
    # logical plan — explain_formatted prints each node twice)
    assert plan.count("FlatMapGroupsInPandas") == 1
    assert plan.count("parquet") <= 1


def test_dsir_weights_broadcast_bucket_joins(spark, sf_dir):
    # both bucket tables are <=4096 rows and must BROADCAST back to the
    # doc-scaled feature stream (a shuffle join keyed on 4096 hot bucket
    # ids would be the classic skew trap); totals are a broadcast scalar;
    # no windows, no cartesian row explosion beyond the 1-row total
    df = _build(spark, sf_dir, "dsir_importance_weights")
    text = plans.explain_formatted(df)
    assert "windowspecdefinition" not in text
    assert plans.broadcast_join_count(df) >= 2
    assert "SortMergeJoin" not in text


def test_ngram_novelty_curve_gram_keyed(spark, sf_dir):
    # first-seen attribution is a gram-keyed MIN aggregate joined back to
    # the distinct per-doc grams — no pairwise doc work, no windows; the
    # max-doc-id scalar joins as a broadcast
    df = _build(spark, sf_dir, "ngram_novelty_curve")
    text = plans.explain_formatted(df)
    assert "windowspecdefinition" not in text
    assert "CartesianProduct" not in text


def test_source_overlap_matrix_no_gram_self_join(spark, sf_dir):
    # pairs explode from each gram's bounded source set — the quadratic
    # gram-relation self-join (the oracle's literal form) must NOT appear:
    # exactly one documents scan, no join of two gram-scaled relations
    # (the only joins are the |sources|-row size tables, broadcast)
    df = _build(spark, sf_dir, "source_overlap_matrix")
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text
    assert "SortMergeJoin" not in text  # only bounded joins, all broadcast
    # the corpus aggregation materializes ONCE into the persisted matrix;
    # diagonal + off-diagonal branches read the cache, never re-scan
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert executed.count("InMemoryTableScan") >= 3


def test_sql_udf_scalar_inlines_to_codegen(spark, sf_dir):
    # Spark 4 SQL UDFs are analysis-time macros: both function bodies
    # (one calling the other) must inline into the hash aggregate — no
    # Python evaluation boundary and no opaque function call survives
    # optimization, so the plan is tpch_q1's shape
    df = _build(spark, sf_dir, "sql_udf_scalar")
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in executed
    assert "ks_disc_price" not in executed and "ks_charge" not in executed
    text = plans.explain_formatted(df)
    assert "HashAggregate" in text  # inlined straight into the aggregate


def test_sql_udf_table_is_generate_node(spark, sf_dir):
    # the correlated LATERAL table function compiles to a generator
    # (explode) under the scan — map-side fan-out, no join and no
    # Python boundary introduced by the function machinery
    df = _build(spark, sf_dir, "sql_udf_table")
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in executed
    assert "Generate" in executed
    text = plans.explain_formatted(df)
    assert "CartesianProduct" not in text


def test_named_window_single_window_node(spark, sf_dir):
    # both OVER w functions must share ONE Window node (one shuffle+sort),
    # which is the point of the named-window spec
    df = _build(spark, sf_dir, "named_window_reuse")
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Window [") == 1


def test_hamming_ann_broadcasts_query_signatures(spark, sf_dir):
    """Binary ANN: one signature projection + broadcast of the 10 query
    signatures — no shuffle of the corpus beyond the final per-query
    top-k window; the scan reads only (vec_id, embedding)."""
    df = _build(spark, sf_dir, "hamming_ann_topk")
    s = plans.plan_summary(df)
    assert s["broadcast_joins"] >= 1
    assert s["sortmerge_joins"] == 0
    for cols in s["scan_columns"]:
        assert set(cols) == {"vec_id", "embedding"}


def test_length_outlier_mad_broadcasts_stats(spark, sf_dir):
    """Per-source robust stats join back by BROADCAST (the stats side is
    bounded by source cardinality); scans prune to (source, n_chars) —
    the text column never leaves the footer."""
    df = _build(spark, sf_dir, "length_outlier_mad")
    s = plans.plan_summary(df)
    assert s["broadcast_joins"] >= 2
    assert s["sortmerge_joins"] == 0
    for cols in s["scan_columns"]:
        assert set(cols) == {"source", "n_chars"}


def test_fertility_and_blocklist_are_single_aggregate(spark, sf_dir):
    """Both text audits are one map-side projection + one hash aggregate
    (2 exchanges = partial/final + the presentation sort), no joins."""
    for name in ("tokenizer_fertility_report", "blocklist_filter_report"):
        df = _build(spark, sf_dir, name)
        s = plans.plan_summary(df)
        assert s["broadcast_joins"] == 0 and s["sortmerge_joins"] == 0
        assert s["exchanges"] <= 2, (name, s["exchanges"])


def test_triangle_broadcast_gate(spark, sf_dir):
    """The two wedge/closure broadcast hints in triangle_count_oriented
    are SIZE-GATED on |E|: present (BroadcastHashJoin) while the packed
    edge set fits the session broadcast budget, absent past it — where
    the plan degrades to shuffle joins with the same O(E^1.5) wedge
    bound and an identical count."""
    df = _build(spark, sf_dir, "triangle_count_oriented")
    assert plans.broadcast_join_count(df) >= 2
    row = df.collect()[0]
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # drop the cached edge/orientation plans (they embed build-1's
    # broadcasts) so the gated rebuild replans from scratch
    from kyuubi_spark.caching import release_caches

    release_caches()
    spark.catalog.clearCache()
    try:
        df2 = _build(spark, sf_dir, "triangle_count_oriented")
        assert plans.broadcast_join_count(df2) == 0
        assert df2.collect()[0] == row
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_snapshot_cdc_is_single_pass(spark, sf_dir):
    """Both snapshot states come from ONE conditional-aggregation pass:
    exactly one scan of orders, no self-join (a two-scan diff would
    double the fact I/O at 100 TB)."""
    df = _build(spark, sf_dir, "snapshot_cdc_diff")
    s = plans.plan_summary(df)
    assert len(s["scan_columns"]) == 1
    assert s["broadcast_joins"] == 0 and s["sortmerge_joins"] == 0


def test_cuped_reads_three_columns_once(spark, sf_dir):
    """CUPED never joins back to the fact table: one scan pruned to
    (custkey, orderdate, totalprice); the per-query scalar stats come
    back via broadcast."""
    df = _build(spark, sf_dir, "cuped_adjusted_ab")
    s = plans.plan_summary(df)
    for cols in s["scan_columns"]:
        assert set(cols) == {"o_custkey", "o_orderdate", "o_totalprice"}
    assert s["sortmerge_joins"] == 0


def test_exact_topk_scan_prunes_to_text(spark, sf_dir):
    """Two-pass exact top-k touches only the text column and never
    sort-merges: candidates join back by BROADCAST semi-join."""
    df = _build(spark, sf_dir, "exact_topk_twopass")
    s = plans.plan_summary(df)
    assert s["sortmerge_joins"] == 0
    for cols in s["scan_columns"]:
        assert set(cols) == {"text"}


def test_rolling_distinct_users_windows_keyed_on_user(spark, sf_dir):
    """The interval-union windows partition on user_id; the ONLY
    unpartitioned window is the cumulative over the calendar-bounded
    day axis (audit-allowlisted)."""
    import re

    df = _build(spark, sf_dir, "rolling_distinct_users_7d")
    text = plans.explain_formatted(df)
    unpart = 0
    for m in re.finditer(r"\(\d+\) Window\b[\s\S]*?Arguments: (.+)", text):
        a = m.group(1)
        if "windowspecdefinition(" not in a:
            continue
        inner = a.split("windowspecdefinition(", 1)[1]
        first = inner.split(",", 1)[0].strip()
        if "user_id" in first:
            continue
        unpart += 1
    assert unpart <= 1


# ---- r14 plan pins (VERDICT r13 Next #6): the optimization-round plan
# wins that could silently regress on a Spark upgrade or refactor.


def test_xml_extract_parses_once(spark, sf_dir):
    """The non-determinism wrapper (sql4.py) must keep from_xml to ONE
    evaluation: today's optimizer doesn't fold
    substring(cast(rand() AS STRING),1,0); if a Spark upgrade starts
    folding it, the pushed filter re-duplicates the parse (guide §4.4)
    and this pin catches it."""
    df = _build(spark, sf_dir, "xml_extract")
    text = plans.explain_formatted(df)
    assert text.count("from_xml") == 1, "from_xml must be evaluated once"


def test_minhash_signatures_map_only(spark, sf_dir):
    """The r13 Arrow fusion: signatures come from ONE map-only pandas-UDF
    pass over the doc scan — no exploded shingle shuffle-aggregate."""
    from kyuubi_spark.functions import dedup as D
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = D.minhash_signatures_df(docs)
    text = plans.explain_formatted(df)
    # the ONLY allowed exchange is the deliberate round-robin spread
    # that parallelizes the Arrow pass over a few input splits — never
    # a doc-keyed aggregate shuffle (the pre-r13 exploded form)
    assert plans.exchange_count(df) <= 1
    assert "ArrowEvalPython" in text
    assert "HashAggregate" not in text


def test_simhash_signatures_map_only(spark, sf_dir):
    from kyuubi_spark.functions import dedup as D
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    df = D.simhash_signatures_df_arrow(docs) if hasattr(
        D, "simhash_signatures_df_arrow"
    ) else docs.select(
        "doc_id", D.simhash_signatures_arrow(64)(F.col("text")).alias("sig")
    )
    assert plans.exchange_count(df) == 0
    assert "ArrowEvalPython" in plans.explain_formatted(df)


def test_kcore_peel_round_never_shuffles_edges(spark, sf_dir):
    """kcore's per-round survivor filter under the broadcast gate: two
    BroadcastHashJoin left-semis, ZERO shuffle Exchange — the edge
    relation must never move during peeling (r13/r14 rewrite)."""
    from kyuubi_spark.caching import release_caches
    from kyuubi_spark.queries.pipeline12 import _peel_survivor_join
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("u")
    )
    edges = (
        li.join(li.withColumnRenamed("u", "v"), "k")
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .localCheckpoint()  # truncate lineage: the pin is the ROUND join
    )
    keep = edges.select(F.col("u").alias("n")).distinct().localCheckpoint()
    try:
        df = _peel_survivor_join(edges, keep, F.broadcast)
        s = plans.plan_summary(df)
        assert s["broadcast_joins"] == 2
        assert s["exchanges"] == 0
        assert s["sortmerge_joins"] == 0
    finally:
        release_caches()


def test_bfs_hop_never_shuffles_edges(spark, sf_dir):
    """bfs's hop expansion under the broadcast gate: frontier join and
    visited anti-join both broadcast — zero edge-side Exchange except
    the distinct's own aggregate exchange on the (tiny) neighbor set."""
    from kyuubi_spark.queries.pipeline11 import _frontier_expand
    from kyuubi_spark.session import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("u"), F.col("l_partkey").alias("v")
    )
    frontier = spark.createDataFrame([(1,)], "n bigint").localCheckpoint()
    visited = frontier
    df = _frontier_expand(
        li, F.broadcast(frontier), F.broadcast(visited)
    )
    s = plans.plan_summary(df)
    assert s["broadcast_joins"] == 2
    # the ONLY allowed exchange is the distinct aggregate on the
    # frontier-sized neighbor set, never on the edge list itself
    assert s["exchanges"] <= 1
    assert s["sortmerge_joins"] == 0


def test_rich_club_no_sortmerge_on_hub_joins(spark, sf_dir):
    """rich_club's hub-set joins must stay broadcast under the gate —
    the persisted edge relation streams through, never sorted/shuffled
    for a sort-merge (r13 rewrite, VERDICT-confirmed plan)."""
    df = _build(spark, sf_dir, "rich_club_coefficient")
    s = plans.plan_summary(df)
    assert s["broadcast_joins"] >= 1
    assert s["sortmerge_joins"] <= 1


def test_lsh_sweep_bucket_join_is_bounded_and_salted(spark, sf_dir):
    """lsh_banding_sweep's candidate join must carry the r14 bucket
    bound: window bucket-size tagging over the join partitioning plus
    the salted hot branch (pmod salt + salt-explode Generate), unioned
    with the cold branch — never an unbounded plain self-join, never a
    nested-loop/cartesian fallback."""
    from kyuubi_spark.functions import dedup as D
    from kyuubi_spark.queries.pipeline14 import _sweep_candidates
    from kyuubi_spark.session import load_table

    docs = load_table(spark, sf_dir, "documents")
    sig = D.minhash_signatures_df(docs).localCheckpoint()
    cand = _sweep_candidates(sig)
    text = plans.explain_formatted(cand)
    assert "pmod" in text, "salt expression missing from hot branch"
    assert text.count("Union") >= 1, "cold/hot branches not unioned"
    import re

    assert re.search(r"(?m)^\(\d+\) Window\b", text), "bucket-size tag"
    assert "BroadcastNestedLoopJoin" not in text
    assert "CartesianProduct" not in text
