"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or "0.1")
    spark = get_spark("msfdp-bench")
    spark.sparkContext.setLogLevel("WARN")

    # untimed warm pass: whole-stage codegen compiles once per plan shape and
    # parquet footers/shuffle machinery initialize — one-time costs that a
    # long-running cluster amortizes to zero, so the timed pass measures the
    # steady-state execution the engine actually sustains
    for name in HEADLINE:
        QUERIES[name].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        spec = QUERIES[name]
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
