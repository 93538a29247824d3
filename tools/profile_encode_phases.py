#!/usr/bin/env python
"""Per-phase wall-time breakdown of the single-core direct encode path.

Replicates exactly what one parquet-direct task does per row group (read ->
column extraction -> selector -> kernel encode) and attributes time to each
phase with perf_counter brackets. No Spark involved: this is the per-core
budget that encode_local{1,4,8,32} legs are made of.

Usage: python tools/profile_encode_phases.py [N_ROW_GROUPS]
"""
from __future__ import annotations

import os
import sys
import time
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from parquet_cpp_spark import chunk as chunkmod  # noqa: E402
from parquet_cpp_spark import selector  # noqa: E402
from parquet_cpp_spark.operators.encode_arrow import (  # noqa: E402
    TOKEN_TABLE_COLUMNS, _arrow_column_values, kernel_phys,
    make_arrow_encode_fn)

PATH = os.path.join(REPO, "data", "bench_tokens_4500000_42.parquet")
NRG = int(sys.argv[1]) if len(sys.argv) > 1 else 20


def main():
    import pyarrow as pa
    pf = pq.ParquetFile(PATH)
    t = defaultdict(float)

    # warm
    fn = make_arrow_encode_fn()
    tbl = pf.read_row_group(0, use_threads=False)
    list(fn(tbl.to_batches()))

    # --- phase-bracketed replication of encode_part ---
    leaves = [(c, (), p) for c, p in TOKEN_TABLE_COLUMNS.items()]
    t0 = time.perf_counter()
    for i in range(1, 1 + NRG):
        ta = time.perf_counter()
        tbl = pq.ParquetFile(PATH).read_row_group(i, use_threads=False)
        tb = time.perf_counter()
        t["read_row_group"] += tb - ta
        batches = tbl.to_batches()
        tbl = pa.Table.from_batches(batches)
        for col, path, phys in leaves:
            ta = time.perf_counter()
            values, row_lengths, elem_valid, inner_lengths, valid_mask = \
                _arrow_column_values(tbl, col, phys, path)
            tb = time.perf_counter()
            t[f"extract:{col}"] += tb - ta
            kp = kernel_phys(phys)
            # selector candidate estimation
            ta = time.perf_counter()
            cands = selector.candidates(values, kp, True)
            tb = time.perf_counter()
            t[f"select:{col}"] += tb - ta
            # encode via encode_best (incl. runoff + internal levels build)
            ta = time.perf_counter()
            enc = selector.encode_best(
                values, kp, row_lengths=row_lengths,
                elem_valid=elem_valid, inner_lengths=inner_lengths,
                valid_mask=valid_mask)
            tb = time.perf_counter()
            t[f"encode_best:{col}:{enc.codec_name}"] += tb - ta
    total = time.perf_counter() - t0
    shown = sum(t.values())
    print(f"=== {NRG} row groups, total {total:.3f}s "
          f"({total/NRG*1000:.1f} ms/rg; accounted {shown:.3f}s) ===")
    for k in sorted(t, key=lambda k: -t[k]):
        print(f"  {k:42s} {t[k]:8.3f}s  {100*t[k]/total:5.1f}%")
    est = 180 * total / NRG
    print(f"est full-table 1-core: {est:.1f}s "
          f"(r7 driver encode_local1 = 78.8s for ~full table)")


if __name__ == "__main__":
    main()
