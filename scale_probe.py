"""Scale probe: synthesize a K× replica of an sf dir (key-shifted fact
tables, dims kept) and time the scale-sensitive queries on it, printing one
JSON line. Surfaces empirically what the plan-shape tests pin structurally:

- q5/q10/q18 after the customer-broadcast fix: AQE must keep promoting the
  (now 10×) customer join or fall back to a shuffle join — either way the
  query completes and scales roughly linearly with the fact tables;
- the LSH-vs-exact near-dup crossover: exact block-pair all-pairs grows
  quadratically with the corpus while the LSH-bucketed path stays
  linear-ish, so the gap should widen visibly at 10×.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_SCALE_K=10 \
       python scale_probe.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)

from pyspark.sql import functions as F

from multi_source_financial_data_pipeline_spark.plans.registry import QUERIES
from multi_source_financial_data_pipeline_spark.session import get_spark
from multi_source_financial_data_pipeline_spark.sources import load_table
from multi_source_financial_data_pipeline_spark.sources.tables import TABLE_NAMES

#: per-replica id offset, far above any real key at these SFs
OFFSET = 1_000_000_000

#: key columns shifted per replica so join relationships stay intact within
#: a replica and never collide across replicas (dimension keys untouched)
SHIFT_COLS = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

PROBE_QUERIES = [
    "q5_region_revenue",
    "q10_returned_revenue",
    "q18_large_orders",
    # fact-fact shuffle joins: must scale linearly, no broadcast cliff
    "q12_ship_priority",
    "q13_order_distribution",
    "q21_late_suppliers",
    "embedding_neardup",
    "lsh_neardup_pairs",
    "minhash_lsh_pairs",
    # brute-vs-IVF crossover: brute grows with the corpus, IVF with
    # corpus/nlist × nprobe
    "ann_topk",
    "ann_topk_ivf",
    "ann_topk_ivf_probe",
    # round-2 additions with shuffling stages: gram-level agg (repetition),
    # broadcast probe join (decontamination), per-shard window (packing)
    "doc_repetition",
    "decontaminate_overlap",
    "sequence_packing",
    # corpus-LM scoring: gram-level aggregates must stay linear in tokens
    "unigram_prob",
]


def replicate(spark, src_dir: str, dst_dir: str, k: int) -> None:
    for name in TABLE_NAMES:
        df = load_table(spark, src_dir, name)
        shift = SHIFT_COLS.get(name)
        if shift:
            parts = []
            for i in range(k):
                rep = df
                for c in shift:
                    rep = rep.withColumn(c, F.col(c) + F.lit(i * OFFSET))
                parts.append(rep)
            out = parts[0]
            for rep in parts[1:]:
                out = out.unionByName(rep)
        else:
            out = df
        out.write.mode("overwrite").parquet(os.path.join(dst_dir, f"{name}.parquet"))


def main() -> None:
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    k = int(os.environ.get("SPARK_GRAFT_SCALE_K", "10"))
    spark = get_spark("msfdp-scale-probe")
    spark.sparkContext.setLogLevel("WARN")
    dst = tempfile.mkdtemp(prefix="msfdp_scale_")
    try:
        t0 = time.perf_counter()
        replicate(spark, src, dst, k)
        gen_s = round(time.perf_counter() - t0, 1)
        timings: dict[str, float] = {}
        for name in PROBE_QUERIES:
            QUERIES[name].fn(spark, dst).write.format("noop").mode("overwrite").save()
            t0 = time.perf_counter()
            QUERIES[name].fn(spark, dst).write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        print(
            json.dumps(
                {
                    "metric": "scale_probe",
                    "base_sf_dir": src,
                    "k": k,
                    "gen_sec": gen_s,
                    "queries": timings,
                    "unit": "sec",
                }
            )
        )
    finally:
        shutil.rmtree(dst, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
