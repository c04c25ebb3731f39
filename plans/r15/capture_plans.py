#!/usr/bin/env python
"""Capture .explain('formatted') for bench entries into plans/r15/.

Usage: python plans/r15/capture_plans.py <suffix> [name ...]
  suffix: 'before' or 'after' (file becomes <query>_<suffix>.txt)
  names:  bench entries to capture; default = every HEADLINE entry.

Plan compilation only (no execution): safe to run on a contended host.
Streaming/ingestor queries EXECUTE work at construction time (their
DataFrame is the final checkpointed state) — their captured plan is the
post-run frame, which is what the plan gate inspects for them too.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.dirname(os.path.abspath(__file__))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    from bench import HEADLINE
    from flume_spark.queries import all_queries
    from flume_spark.session import get_spark

    spark = get_spark(app_name="plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names or HEADLINE:
        try:
            df = queries[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # capture the failure, keep going
            text = f"CAPTURE ERROR: {exc!r}\n"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(name, "ok" if "ERROR" not in text[:20] else "ERR", flush=True)


if __name__ == "__main__":
    main()
