"""Driver-contract emulation: every queries() entry with an oracle_sql()
entry must match DuckDB on row count, column names, and order-insensitive
values at sf0.01 — the same comparison CORRECTNESS_r{N}.json records."""

import os
import sys

import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def spark():
    from parquet_cpp_spark.session import get_spark
    return get_spark(master="local[4]", app_name="pcs-oracle",
                     shuffle_partitions=4)


@pytest.fixture(scope="module")
def duck():
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Emulates the driver's canonicalizer exactly: sort columns by name,
    then sort_values over all columns. Crucially it does NOT convert list
    columns to tuples — the driver can't, so a query returning an array
    column must fail here too (round 1 shipped 11 err'd correctness rows
    because this helper used to mask exactly that)."""
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), ignore_index=True)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_every_query_has_callable_signature():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    # Exact equality so a new query silently missing its oracle fails
    # here. As of r6 EVERY query is oracle-checked: codec_selection (the
    # last rows-only entry) now pins its deterministic histogram as a
    # VALUES oracle; r5 gave compression_manifest a first-principles
    # raw_bytes oracle and media_features a persisted-ground-truth oracle.
    no_oracle = set(q) - set(o)
    assert no_oracle == set()


def test_rotated_queries_keep_oracle_coverage():
    """The 11 codec round-trips rotated past the driver's 50-entry
    correctness window must each keep an oracle_sql() entry, so
    test_query_matches_oracle (parametrized over oracle_sql keys) still
    runs them end-to-end against DuckDB here even though the driver no
    longer does. A rotation that drops a query's oracle fails this pin."""
    rotated = set(list(entry_mod.queries())[50:])
    assert rotated, "rotation list is empty — did the cap change?"
    missing = rotated - set(entry_mod.oracle_sql())
    assert not missing, f"rotated past driver cap AND oracle-less: {missing}"


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    qdf = entry_mod.queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(entry_mod.oracle_sql()[name]).df()
    assert len(qdf) == len(odf), f"{name}: rows {len(qdf)} vs {len(odf)}"
    assert sorted(qdf.columns) == sorted(odf.columns), name
    a, b = _canon(qdf), _canon(odf)
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)


def test_rows_only_queries_run(spark):
    q = entry_mod.queries()
    for name in ("codec_selection", "compression_manifest",
                 "ann_cosine_topk", "ann_cosine_lsh", "neardup_cosine_lsh",
                 "ann_cosine_ivf"):
        assert q[name](spark, SF_DIR).count() > 0


def test_codec_selection_pinned_choices(spark):
    """codec_selection is the one rows-only driver query (no SQL analog
    for an engine-internal decision), so pin the selector's per-column
    choices on the driver data here: a selector regression that flips a
    column to a worse codec fails this test instead of passing silently.
    Changing the selector deliberately means updating this pin."""
    import __spark_entry__ as em
    ch = em._chunks(spark, SF_DIR)
    got = {(r.col, r.codec)
           for r in ch.select("col", "codec").distinct().collect()}
    assert got == {
        ("doc_id", "DELTA_BYTE_ARRAY"),   # sequential-ish id strings
        ("n_tok", "RLE"),                 # small-range ints
        ("source", "RLE_DICTIONARY"),     # low-cardinality strings
        ("tokens", "RLE_DICTIONARY"),     # mixed-profile token ids
    }, got
