#!/usr/bin/env python
"""sf1 scale proof point: the full encode->decode round trip at 10x the
default bench table (45M rows, ~11.5G tokens), recorded beside the sf0.1
numbers in BENCH_local.json.

The cheapest way to convert "these plans survive 100x" from design review
into measurement: per-token throughput at sf1 should sit within ~1.3x of
the sf0.1 figure (same plans, same per-task kernel work, 10x the task
count), and the round trip must stay bit-identical. The 1-core scaling
windows are NOT rerun here — at 45M rows a single 1-core leg is ~14 min
and the scaling evidence lives in bench.py's protocol; this run pins the
throughput-at-scale and correctness-at-scale claims.

Usage: python tools/bench_sf1.py   (idle box; ~20-30 min incl. synthesis)
"""

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = int(os.environ.get("SPARK_GRAFT_SF1_ROWS", "45000000"))
SEED = 42
ROW_GROUP = 25_000
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import functions as F

    import bench as bench_mod
    from parquet_cpp_spark.operators.decode_arrow import decode_parquet_direct
    from parquet_cpp_spark.sources.parquet_direct import encode_parquet_direct
    from parquet_cpp_spark.sources.tokens import synthesize_tokens_parquet

    path = os.path.join(REPO, "data",
                        f"bench_tokens_{ROWS}_{SEED}.parquet")
    t0 = time.perf_counter()
    synthesize_tokens_parquet(path, ROWS, SEED, row_group_size=ROW_GROUP)
    t_synth = time.perf_counter() - t0
    print(f"synthesized {ROWS} rows in {t_synth:.0f}s", flush=True)

    out: dict = {"rows": ROWS, "synth_s": round(t_synth, 1)}
    spark = bench_mod._session(CPUS)
    bench_mod._warmup(spark)
    t_enc, totals = bench_mod._encode_direct_run(spark, path, reps=2)
    out["encode_local%d_s" % CPUS] = round(t_enc, 2)
    out.update(totals)
    out["encode_mtokens_per_s"] = round(totals["n_tokens"] / t_enc / 1e6, 2)
    out["bytes_per_token"] = round(
        totals["enc_bytes"] / totals["n_tokens"], 4)

    chunks_path = os.path.join(REPO, "data", "bench_chunks_sf1")
    shutil.rmtree(chunks_path, ignore_errors=True)
    t0 = time.perf_counter()
    encode_parquet_direct(spark, path).write.parquet(chunks_path)
    out["encode_write_s"] = round(time.perf_counter() - t0, 2)

    t_dec = None
    for _ in range(2):
        t0 = time.perf_counter()
        n_dec = decode_parquet_direct(spark, chunks_path) \
            .agg(F.sum("n_tok")).collect()[0][0]
        w = time.perf_counter() - t0
        t_dec = w if t_dec is None else min(t_dec, w)
    assert n_dec == totals["n_tokens"], (n_dec, totals)
    out["decode_local%d_s" % CPUS] = round(t_dec, 2)
    out["decode_mtokens_per_s"] = round(n_dec / t_dec / 1e6, 2)

    def _content_sum(df):
        row_hash = F.xxhash64("doc_id", "tokens", "n_tok", "source") \
            .cast("decimal(38,0)")
        return df.agg(F.sum(row_hash).alias("s"),
                      F.count("*").alias("n")).collect()[0]
    a = _content_sum(spark.read.parquet(path))
    b = _content_sum(decode_parquet_direct(spark, chunks_path)
                     .drop("part_id"))
    out["roundtrip_bit_identical"] = bool(a.s == b.s and a.n == b.n)
    assert out["roundtrip_bit_identical"], (a, b)
    spark.stop()
    shutil.rmtree(chunks_path, ignore_errors=True)
    os.remove(path)  # reclaim the ~25 GB source

    blj = os.path.join(REPO, "BENCH_local.json")
    try:
        with open(blj) as f:
            doc = json.load(f)
    except Exception:
        doc = {}
    doc["sf1"] = out
    with open(blj, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({"sf1": out}), flush=True)


if __name__ == "__main__":
    main()
