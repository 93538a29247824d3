"""sf1 CORRECTNESS spot check: the round-trip oracle at 10x driver scale.

The driver's correctness harness runs every oracle at sf0.01 (500 docs);
the sf1 throughput proof (tools/bench_sf1.py) pins bit-identity but only
Spark-vs-Spark. This script closes the gap the round-6 verdict named
(stretch 9): one rt_auto-class CROSS-ENGINE comparison at sf1 — the
45M-row / 11.5G-token synthetic table — so correctness, not just
throughput, has a 10x proof point.

Method: encode the table with the parquet-direct path (auto codec
selection, the rt_auto configuration), decode it back, and reduce the
decoded rows to (count, decimal-sum of a 48-bit slice of each row's md5
digest). DuckDB computes the SAME digest aggregate straight off the
SOURCE parquet. Equal sums across two independent engines over two
independent paths (engine decode vs source scan) bound any corruption:
a single flipped token changes the row digest and the sum.

Digest grammar (identical text on both sides):
    md5(doc_id || '|' || tokens joined by ' ' || '|' || n_tok || '|'
        || source)
Sum: first 12 hex chars as a 48-bit int, summed exactly as DECIMAL(38,0)
(Spark conv(...,16,10) / DuckDB ('0x'||substr)::BIGINT — both exact).

Usage: python tools/check_sf1_oracle.py   (idle box; ~25 min incl.
synthesis if data/bench_tokens_45000000_42.parquet is absent)
Writes the result into BENCH_local.json under "sf1_oracle".
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROWS = 45_000_000
SEED = 42
ROW_GROUP = 25_000


def main() -> None:
    import duckdb

    from parquet_cpp_spark.sources.tokens import synthesize_tokens_parquet

    path = os.path.join(REPO, "data",
                        f"bench_tokens_{ROWS}_{SEED}.parquet")
    t0 = time.time()
    synthesize_tokens_parquet(path, ROWS, SEED, row_group_size=ROW_GROUP)
    print(f"table ready in {time.time() - t0:.0f}s", flush=True)

    # --- DuckDB side: digest aggregate over the SOURCE parquet ---
    t0 = time.time()
    con = duckdb.connect()
    o_sql = f"""
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(('0x' || substr(md5(
                   doc_id || '|' ||
                   coalesce(array_to_string(list_transform(tokens,
                       t -> CAST(t AS VARCHAR)), ' '), '') || '|' ||
                   CAST(n_tok AS VARCHAR) || '|' || source
               ), 1, 12))::BIGINT) AS DECIMAL(38,0)) AS s
        FROM read_parquet('{path}')
        -- coalesce: DuckDB's array_to_string([]) is NULL, python/Spark ''
    """
    o_n, o_s = con.execute(o_sql).fetchone()
    t_duck = time.time() - t0
    print(f"duckdb: n={o_n} sum={o_s} in {t_duck:.0f}s", flush=True)

    # --- Spark side: encode -> decode (rt_auto-class direct path) ---
    from pyspark.sql import functions as F

    from parquet_cpp_spark.operators.decode_arrow import decode_parquet_direct
    from parquet_cpp_spark.session import get_spark
    from parquet_cpp_spark.sources.parquet_direct import encode_parquet_direct

    spark = get_spark(master="local[32]", shuffle_partitions=64,
                      app_name="pcs-sf1-oracle")
    import shutil
    chunks_path = os.path.join(REPO, "data", "bench_chunks_sf1_oracle")
    shutil.rmtree(chunks_path, ignore_errors=True)
    t0 = time.time()
    encode_parquet_direct(spark, path).write.parquet(chunks_path)
    t_enc = time.time() - t0

    t0 = time.time()
    decoded = decode_parquet_direct(spark, chunks_path).drop("part_id")
    digest = F.md5(F.concat_ws(
        "|", "doc_id",
        F.array_join(F.transform("tokens", lambda x: x.cast("string")),
                     " "),
        F.col("n_tok").cast("string"), "source"))
    row = decoded.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.conv(F.substring(digest, 1, 12), 16, 10)
              .cast("decimal(38,0)")).alias("s")).collect()[0]
    t_dec = time.time() - t0
    spark.stop()
    shutil.rmtree(chunks_path, ignore_errors=True)
    print(f"spark decode digest: n={row.n} sum={row.s} "
          f"(enc {t_enc:.0f}s, dec+agg {t_dec:.0f}s)", flush=True)

    match = (int(row.n) == int(o_n)) and (int(row.s) == int(o_s))
    result = {"rows": int(row.n), "digest_sum": str(row.s),
              "oracle_rows": int(o_n), "oracle_digest_sum": str(o_s),
              "match": match, "duckdb_s": round(t_duck, 1),
              "encode_s": round(t_enc, 1), "decode_agg_s": round(t_dec, 1)}
    print(json.dumps({"sf1_oracle": result}))
    blpath = os.path.join(REPO, "BENCH_local.json")
    try:
        with open(blpath) as f:
            bl = json.load(f)
    except Exception:
        bl = {}
    bl["sf1_oracle"] = result
    with open(blpath, "w") as f:
        json.dump(bl, f)
    assert match, "sf1 cross-engine digest mismatch"


if __name__ == "__main__":
    main()
