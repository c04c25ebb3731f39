#!/usr/bin/env python
"""Per-JOB duration profile for one bench entry: run the entry once
(bench.py methodology — sf0.001 warm-up, cache hygiene) and print every
Spark job it submitted with duration + description, slowest first.
The host-independent companion to plans/r15/measure.py: tells you WHICH
action inside a multi-action entry (streaming ingestors, composed
funnels) carries the time.

Usage: python plans/r15/profile_jobs.py <entry> [entry ...]
"""
import gc
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")


def jobs_list(spark):
    it = spark.sparkContext._jsc.sc().statusStore().jobsList(None).iterator()
    out = []
    while it.hasNext():
        j = it.next()
        sub = j.submissionTime()
        comp = j.completionTime()
        dur = None
        if sub.isDefined() and comp.isDefined():
            dur = (
                comp.get().getTime() - sub.get().getTime()
            ) / 1000.0
        out.append(
            (
                j.jobId(),
                dur,
                (j.description().get() if j.description().isDefined() else j.name())[
                    :110
                ],
            )
        )
    return out


def main() -> None:
    names = sys.argv[1:]
    from flume_spark.queries import all_queries
    from flume_spark.session import get_spark

    spark = get_spark(app_name="r15_profile")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        fn = queries[name]
        try:
            fn(spark, WARM_DIR).collect()
        except Exception as exc:
            print(f"{name}: warm-up error {exc!r}", file=sys.stderr)
        spark.catalog.clearCache()
        gc.collect()
        before_ids = {j[0] for j in jobs_list(spark)}
        start = time.perf_counter()
        rows = fn(spark, SF_DIR).collect()
        wall = time.perf_counter() - start
        assert rows is not None
        new = [j for j in jobs_list(spark) if j[0] not in before_ids]
        total = sum(j[1] or 0 for j in new)
        print(f"\n=== {name}: wall {wall:.2f}s, {len(new)} jobs, "
              f"sum(job dur) {total:.2f}s ===")
        for jid, dur, desc in sorted(new, key=lambda j: -(j[1] or 0)):
            print(f"  {dur if dur is not None else -1:7.2f}s  job {jid:4d}  {desc}")


if __name__ == "__main__":
    main()
