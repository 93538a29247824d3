#!/usr/bin/env python
"""Time every declared query (noop sink) and dump its formatted plan.

Guide §1: measure first, label jobs, use the noop sink so the computation
(not the collect/sink) is timed. Writes plans to plans/r08/<name>_<tag>.txt
and prints one JSON line per query plus a sorted summary.

Usage: python tools/query_sweep.py [tag] [sf_dir] [only,names]
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
PLAN_DIR = os.path.join(REPO, "plans", "r08")
os.makedirs(PLAN_DIR, exist_ok=True)


def main():
    from parquet_cpp_spark.session import get_spark
    import __spark_entry__ as entry

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus * 4,
                      app_name=f"query-sweep-{TAG}")
    qs = entry.queries()
    results = {}
    for name, fn in qs.items():
        if ONLY is not None and name not in ONLY:
            continue
        spark.sparkContext.setJobDescription(f"sweep:{name}")
        try:
            t0 = time.perf_counter()
            df = fn(spark, SF)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            t_plan = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_run = time.perf_counter() - t0
            with open(os.path.join(PLAN_DIR, f"{name}_{TAG}.txt"), "w") as f:
                f.write(plan)
            results[name] = {"plan_s": round(t_plan, 2),
                             "run_s": round(t_run, 2)}
            print(json.dumps({"q": name, **results[name]}), flush=True)
        except Exception:
            results[name] = {"err": traceback.format_exc(limit=2)}
            print(json.dumps({"q": name, "err": "FAILED"}), flush=True)
        finally:
            spark.sparkContext.setJobDescription(None)
    order = sorted((r.get("run_s", 1e9), n) for n, r in results.items())
    print("\n=== slowest first ===")
    for t, n in reversed(order):
        print(f"  {n:28s} {results[n]}")
    spark.stop()


if __name__ == "__main__":
    main()
