"""Run queries() vs oracle_sql() side by side (the driver's correctness
check, locally): python tools/compare_oracle.py [query ...] [--sf DIR]"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as e

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a.split("=", 1)[1]
    q, o = e.queries(), e.oracle_sql()
    names = args or sorted(set(q) & set(o))

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failed = []
    for name in names:
        if name not in q:
            print(f"{name}: NOT A QUERY")
            failed.append(name)
            continue
        try:
            sdf = q[name](spark, sf).toPandas()
            if name not in o:
                print(f"{name}: no_oracle rows={len(sdf)}")
                continue
            odf = con.execute(o[name]).df()
            cols = sorted(sdf.columns)
            if sorted(odf.columns) != cols:
                print(f"{name}: SCHEMA MISMATCH spark={cols} "
                      f"oracle={sorted(odf.columns)}")
                failed.append(name)
                continue
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].astype(a.dtypes.to_dict(), errors="ignore") \
                .sort_values(cols).reset_index(drop=True)
            ok = len(a) == len(b) and a.equals(b)
            print(f"{name}: rows {len(a)}/{len(b)} "
                  f"{'MATCH' if ok else 'MISMATCH'}")
            if not ok:
                failed.append(name)
                if len(a) == len(b):
                    neq = (a != b).any(axis=0)
                    print("  differing cols:", list(neq[neq].index))
                    mask = (a != b).any(axis=1)
                    print(a[mask].head(3))
                    print(b[mask].head(3))
        except Exception as ex:  # noqa: BLE001
            print(f"{name}: ERROR {type(ex).__name__}: {ex}")
            failed.append(name)
    print("FAILED:" if failed else "ALL MATCH", failed or "")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
