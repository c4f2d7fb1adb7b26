"""Registry-wide plan audit: single-partition windows + cartesians.

Builds every registry query's physical plan and fails (exit 1) on:
- an UNPARTITIONED Window node (whole relation to ONE task) outside the
  reviewed bounded-input allowlist below;
- any CartesianProduct node (no allowlist — a cartesian over driver
  tables is always a scale bug; intentional tiny cross joins plan as
  1-row BroadcastNestedLoopJoin, which is not flagged).

    python tools/window_audit.py [sf_dir]

Partition detection parses windowspecdefinition: partition columns are
its bare leading arguments; sort orders carry ASC/DESC.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, __file__.rsplit("/tools/", 1)[0])

# Reviewed bounded-input windows (see VERDICT r05 plan audit + round-6
# re-audit): every entry names WHY the input is bounded.
ALLOWLIST = {
    "approx_topk_cms": "<=20-row CMS heavy-hitter rerank",
    "vocab_growth_heaps": "cumulative over the 10 corpus-decile rows"
    " (first-occurrence detection itself is one keyed min-aggregate)",
    "tpcds_q44": "row_number over TakeOrderedAndProject'd <=10-row inputs",
    "tpcds_q70": "state ranking over ~25 rows",
    "tpcds_shape_cumulative_share": "per-day cumulative (time-bounded)",
    "tpcds_shape_rank_bestworst": "rank over limit(10) inputs",
    "vocab_coverage_report": "cumulative over <= ~40 log2-rank bucket rows"
    " (bounded by log2 of vocab size; the vocab-scaled rank itself runs"
    " on the distributed ranker)",
    "k_anonymity_report": "grand-total share over the <=4-row k-band"
    " rollup (the corpus-scaled quasi-identifier aggregate is keyed and"
    " map-side combined)",
    "kaplan_meier_retention": "risk-set and survival cumulative windows"
    " over the <=31 day-step rollup rows (per-user lifetimes come from a"
    " keyed aggregate)",
    "spend_gini_lorenz": "cumulative share over the 10 decile rollup"
    " rows (the global rank itself runs on the distributed exact"
    " ranker)",
    "cusum_changepoint": "cumulative drift + rank over the calendar-"
    "bounded daily rollup (<=2557 rows for the 7-year order range;"
    " the corpus-scaled stage is the day-keyed map-side aggregate)",
    "ks_two_sample": "ECDF cumulative over the value-keyed length"
    " rollup (one row per distinct doc length — bounded by the length"
    " cap, not corpus rows; vocab_coverage class)",
    "rrf_fusion_topk": "per-lane rank over TakeOrderedAndProject'd"
    " <=50-row inputs (tpcds_q44 class); both retrieval lanes reach"
    " their top-50 without a global window",
    "ndcg_retrieval_eval": "rank over TakeOrderedAndProject'd <=20-row"
    " ranking/ideal slices (tpcds_q44 class)",
    "popularity_powerlaw_hill": "rank over a TakeOrderedAndProject'd"
    " <=101-row top-k slice (tpcds_q44 class)",
    "mann_whitney_auc": "cumulative over the value-keyed length rollup"
    " (bounded by the length cap; ks_two_sample class)",
    "rolling_distinct_users_7d": "cumulative over the CALENDAR-bounded"
    " day axis (<= days+boundaries rows after the per-user interval"
    " union; the user-scaled work is all keyed on user_id)",
    "gains_lift_table": "cumulative over the 10 decile rollup rows"
    " (tpcds_q44 class; the data-scaled ranking runs on the"
    " distributed ranker)",
    "slo_burn_rate_windows": "6h sliding sum over the CALENDAR-bounded"
    " hourly rollup (<= 720 rows/month)",
    "forecast_backtest_naive": "lag-1/lag-7 over the CALENDAR-bounded"
    " daily rollup (<= 31 rows; ts_gap_fill class)",
    "neyman_allocation_plan": "largest-remainder seat rank over the"
    " 5 stratum rows (segment-bounded)",
    "transition_entropy_profile": "grand-total share over the <=5"
    " from-state rows (state-space-bounded)",
    "binary_segmentation_split": "prefix/argmin windows over the"
    " CALENDAR-bounded daily rollup (<= 31 rows; ts_gap_fill class)",
    "exact_topk_twopass": "final rank over the two-pass candidate set"
    " (<= 40 x partitions rows by construction - the long tail never"
    " reaches the window)",
    "price_ending_bias": "top-5 rank over the <= 100 cent-ending"
    " rollup rows (domain-bounded)",
}


def window_is_partitioned(args: str) -> bool:
    inner = args.split("windowspecdefinition(", 1)[1]
    first = inner.split(",", 1)[0].strip()
    return (
        "specifiedwindowframe" not in first
        and " ASC" not in first
        and " DESC" not in first
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from kyuubi_spark import plans
    from kyuubi_spark.caching import release_caches
    from kyuubi_spark.queries import all_queries
    from kyuubi_spark.session import build_session

    spark = build_session(app_name="window-audit")
    offenders: dict[str, str] = {}
    cartesians: list[str] = []
    errors = 0
    for name, spec in all_queries().items():
        try:
            text = plans.explain_formatted(spec.builder(spark, sf_dir))
            for m in re.finditer(r"\(\d+\) Window\b[\s\S]*?Arguments: (.+)", text):
                if "windowspecdefinition(" in m.group(1) and not window_is_partitioned(
                    m.group(1)
                ):
                    offenders.setdefault(name, m.group(1)[:100])
            if "CartesianProduct" in text:
                cartesians.append(name)
        except Exception as e:  # noqa: BLE001 - report and keep auditing
            errors += 1
            print(f"ERR  {name}: {e}", file=sys.stderr)
        finally:
            release_caches()

    bad = {k: v for k, v in offenders.items() if k not in ALLOWLIST}
    for name in cartesians:
        print(f"[FAIL] {name}: CartesianProduct in the plan")
    for name in sorted(offenders):
        tag = "allow" if name in ALLOWLIST else "FAIL"
        why = ALLOWLIST.get(name, "NOT ALLOWLISTED — single-partition at scale")
        print(f"[{tag}] {name}: {why}")
    print(
        f"plan audit: {len(offenders)} unpartitioned-window queries "
        f"({len(bad)} outside the allowlist), {len(cartesians)} cartesians, "
        f"{errors} build errors"
    )
    sys.exit(1 if bad or cartesians or errors else 0)


if __name__ == "__main__":
    main()
