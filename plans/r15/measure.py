#!/usr/bin/env python
"""Isolated per-entry re-measure for round-15 iteration: bench.py's exact
methodology (sf0.001 warm-up, per-entry cache hygiene, min-of-N
collect-timed samples at $SPARK_GRAFT_SF_DIR) plus the Spark job count
per timed run — the fixed-overhead signal the optimization loop tracks.

Usage: python plans/r15/measure.py <entry> [entry ...]
Env:   SPARK_GRAFT_BENCH_SAMPLES (default 3)
"""
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")


def n_jobs(spark) -> int:
    return spark.sparkContext._jsc.sc().statusStore().jobsList(None).size()


def main() -> None:
    names = sys.argv[1:]
    samples_n = int(os.environ.get("SPARK_GRAFT_BENCH_SAMPLES", "3"))
    from bench import executed_plan_counts
    from flume_spark.queries import all_queries
    from flume_spark.session import get_spark

    spark = get_spark(app_name="r15_measure")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    out = {}
    for name in names:
        fn = queries[name]
        try:
            fn(spark, WARM_DIR).collect()
        except Exception as exc:
            print(f"{name}: warm-up error {exc!r}", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()
        runs, jobs, df = [], [], None
        for _ in range(samples_n):
            j0 = n_jobs(spark)
            start = time.perf_counter()
            df = fn(spark, SF_DIR)
            rows = df.collect()
            runs.append(round(time.perf_counter() - start, 3))
            jobs.append(n_jobs(spark) - j0)
            assert rows is not None
        out[name] = {
            "min": min(runs),
            "runs": runs,
            "jobs": jobs,
            "plan": executed_plan_counts(df),
        }
        print(json.dumps({name: out[name]}), flush=True)
    print("TOTALS " + json.dumps({k: v["min"] for k, v in out.items()}))


if __name__ == "__main__":
    main()
