"""r19 probe: time named queries (bench methodology: untimed warm pass,
N timed reps, median+min) and optionally dump .explain('formatted').
Usage: python .r19_probe.py q1,q2,... [--plans OUTDIR] [--reps N]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS as in bench.py.
"""
import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO)

from multi_source_financial_data_pipeline_spark.plans.registry import QUERIES
from multi_source_financial_data_pipeline_spark.session import get_spark


def main():
    names = sys.argv[1].split(",")
    plans_dir = None
    reps = 3
    args = sys.argv[2:]
    while args:
        a = args.pop(0)
        if a == "--plans":
            plans_dir = args.pop(0)
        elif a == "--reps":
            reps = int(args.pop(0))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r19-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r19 probe: {name}")
        fn = QUERIES[name].fn
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = fn(spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as fh:
                fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        # warm
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
        out[name] = {"median": round(statistics.median(samples), 3),
                     "min": round(min(samples), 3)}
        print(name, out[name], flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
