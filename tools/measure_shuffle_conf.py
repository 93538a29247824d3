#!/usr/bin/env python
"""Time the shuffle encode pipeline under one Spark conf variant.

Usage: python tools/measure_shuffle_conf.py <name> [k=v ...]
Prints one JSON line {"name":..., "best_s":..., "runs":[...]}.
Run each variant in its OWN process (Spark conf is session-global).
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

name = sys.argv[1]
extra = dict(kv.split("=", 1) for kv in sys.argv[2:])

from parquet_cpp_spark.session import get_spark  # noqa: E402

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS * 4,
                  app_name=f"shufconf-{name}", extra_conf=extra)

from pyspark.sql import functions as F  # noqa: E402
from parquet_cpp_spark.plans import encode_job  # noqa: E402

path = os.path.join(REPO, "data", "bench_tokens_4500000_42.parquet")
df = spark.read.parquet(path)
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    encode_job.encode_pipeline(df, CPUS * 4).agg(
        F.sum("enc_bytes")).collect()
    runs.append(round(time.perf_counter() - t0, 3))
print(json.dumps({"name": name, "best_s": min(runs), "runs": runs,
                  "conf": extra}))
spark.stop()
