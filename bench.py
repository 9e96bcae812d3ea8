"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec | null, "unit": "sec",
"queries": {name: sec}, "errors": {name: msg}, "sf": ...}.

Broken queries land in "errors" (never mixed into "queries", which stays
{name: float}); any error makes "value" null and the exit code nonzero so a
round-over-round comparison can't misread a shrunken total as a speedup.

Each query is fully evaluated with a noop sink (forces every column, unlike
count(), which lets Catalyst prune the projections we want measured).
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from multi_source_financial_data_pipeline_spark.plans.registry import QUERIES
from multi_source_financial_data_pipeline_spark.session import get_spark

HEADLINE = [
    "ts_features",
    "q1_pricing_summary",
    "q3_top_revenue",
    "q4_order_priority",
    "q5_region_revenue",
    "q7_shipping_volume",
    "q10_returned_revenue",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "cross_source_compare",
    "dedup_keep_last",
    "missing_bdays",
    "zscore_outliers",
    "token_stats",
    "minhash_lsh_pairs",
    "simhash",
    "ann_topk",
    "ann_topk_ivf",
    "ann_topk_ivf_probe",
    "embedding_neardup",
    "lsh_neardup_pairs",
    "asof_join",
    "sessionize",
    "time_bucket_hourly",
    "range_join_nearby",
    "event_rollup_day",
    "q6_forecast_revenue",
    "funnel_conversion",
    "return_correlation",
    "vol_outliers",
    "neardup_verified",
    "curation_kept",
    "doc_repetition",
    "trailing_7d_sum",
    "sequence_packing",
    "gap_fill_ffill",
    "event_cube",
    "topn_orders_per_customer",
    "decontaminate_overlap",
    "cohort_retention",
    # round-5 additions
    "unigram_prob",
    "weekly_bars",
    "max_drawdown",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("msfdp-bench")
    spark.sparkContext.setLogLevel("WARN")

    # untimed warm pass: whole-stage codegen compiles once per plan shape and
    # parquet footers/shuffle machinery initialize — one-time costs that a
    # long-running cluster amortizes to zero, so the timed pass measures the
    # steady-state execution the engine actually sustains. Each query is
    # isolated: one broken plan must cost ONE entry, not the whole report
    # (r03 lost every timing to a single analysis error in the warm pass).
    broken: dict[str, str] = {}
    for name in HEADLINE:
        try:
            QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as exc:  # noqa: BLE001 - report, don't abort
            broken[name] = f"{type(exc).__name__}: {exc}"[:500]

    timings: dict[str, float] = {}
    errors: dict[str, str] = dict(broken)
    total = 0.0
    for name in HEADLINE:
        if name in errors:
            continue
        spec = QUERIES[name]
        t0 = time.perf_counter()
        try:
            spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        elapsed = round(time.perf_counter() - t0, 3)
        timings[name] = elapsed
        total += elapsed

    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                # a partial total is not comparable across rounds — null it
                "value": round(total, 3) if not errors else None,
                "unit": "sec",
                "queries": timings,
                "errors": errors,
                "sf": sf,
            }
        )
    )
    spark.stop()
    if errors:
        sys.exit(1)


if __name__ == "__main__":
    main()
