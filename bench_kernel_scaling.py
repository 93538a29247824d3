#!/usr/bin/env python
"""Kernel-level scaling evidence, independent of Spark.

Runs the exact per-task encode function over real row groups in N parallel
processes and reports per-task time and aggregate throughput, plus a pure
memcpy probe that measures the host's memory-bandwidth ceiling. Together
these separate engine scaling from host throttling: if per-task encode time
is flat while memcpy time balloons, the engine scales and the host doesn't
(see BASELINE.md notes).

    python bench_kernel_scaling.py            # procs = 1, 8, 32
"""

from __future__ import annotations

import json
import os
import sys
import time
from multiprocessing import Pool

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("SPARK_GRAFT_BENCH_ROWS", "2000000"))
SEED = 42
# 4 is the headline N->4N pair's high leg; 8/32 show the DRAM ceiling
LEVELS = (1, 4, 8, 32)


def _input_path() -> str:
    from parquet_cpp_spark.sources.tokens import synthesize_tokens_parquet
    path = os.path.join(REPO, "data", f"bench_tokens_{ROWS}_{SEED}.parquet")
    return synthesize_tokens_parquet(path, ROWS, SEED, row_group_size=25000)


def encode_task(args):
    seed, path = args
    import pyarrow.parquet as pq
    from parquet_cpp_spark.operators.encode_arrow import make_arrow_encode_fn
    f = pq.ParquetFile(path)
    tbl = f.read_row_group(seed % f.metadata.num_row_groups)
    fn = make_arrow_encode_fn()
    t0 = time.perf_counter()
    list(fn(tbl.to_batches()))
    return int(sum(tbl.column("n_tok").to_pylist())), time.perf_counter() - t0


def memcpy_task(_):
    a = np.random.default_rng(1).integers(0, 255, 100_000_000,
                                          dtype=np.uint8)
    t0 = time.perf_counter()
    for _i in range(3):
        a.copy()
    return time.perf_counter() - t0


def main() -> None:
    path = _input_path()
    out = {"rows": ROWS, "levels": {}}
    for nproc in LEVELS:
        with Pool(nproc) as p:
            t0 = time.perf_counter()
            res = p.map(encode_task, [(i, path) for i in range(nproc * 2)])
            wall = time.perf_counter() - t0
        toks = sum(r[0] for r in res)
        per_task = float(np.mean([r[1] for r in res]))
        with Pool(nproc) as p:
            mem = p.map(memcpy_task, range(nproc))
        out["levels"][str(nproc)] = {
            "agg_mtokens_per_s": round(toks / wall / 1e6, 2),
            "encode_per_task_s": round(per_task, 3),
            "memcpy_per_task_s": round(float(np.mean(mem)), 3),
        }
    lv = out["levels"]
    out["per_task_flatness_1_to_4"] = round(
        lv["1"]["encode_per_task_s"] / lv["4"]["encode_per_task_s"], 3)
    out["per_task_flatness_1_to_32"] = round(
        lv["1"]["encode_per_task_s"] / lv["32"]["encode_per_task_s"], 3)
    out["memcpy_slowdown_1_to_32"] = round(
        lv["32"]["memcpy_per_task_s"] / lv["1"]["memcpy_per_task_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
