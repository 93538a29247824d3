"""Curation text gates with hand-computed fixtures: Gopher repetition
stats and the PII pre-scrub scan (the synthetic corpus carries no PII, so
injected rows pin the actual matching behavior)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="module")
def spark():
    from parquet_cpp_spark.session import get_spark
    return get_spark(master="local[4]", app_name="pcs-text-gates",
                     shuffle_partitions=4)


def test_repetition_stats_hand_computed(spark):
    from parquet_cpp_spark.functions.text import repetition_stats

    docs = spark.createDataFrame(
        [("1", "a a a a"),            # 4 words, 1 distinct
         ("2", "a b c d"),            # no repetition
         ("3", "x y x y x y"),        # words dup; 3-grams: 4 total 2 uniq
         ("4", "w")],                 # single word: no 3-grams
        "doc_id string, text string")
    got = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert got["1"].dup_word_ppm == 750000       # (4-1)/4
    assert got["1"].top_word_ppm == 1000000
    assert got["1"].dup_3gram_ppm == 500000      # 2 grams, 1 distinct
    assert got["2"].dup_word_ppm == 0
    assert got["2"].dup_3gram_ppm == 0
    assert got["2"].top_word_ppm == 250000
    assert got["3"].dup_word_ppm == 666666       # (6-2)/6 truncating
    assert got["3"].dup_3gram_ppm == 500000      # 4 grams, 2 distinct
    assert got["4"].n_words == 1
    assert got["4"].dup_3gram_ppm == 0           # empty gram set -> 0


def test_pii_scan_fixtures(spark):
    from parquet_cpp_spark.functions.text import pii_scan

    docs = spark.createDataFrame(
        [("1", "contact a.b+c@example.org or admin@test.co now"),
         ("2", "hosts 192.168.0.1 10.0.0.255 and version 1.2"),
         ("3", "card 1234567890123456 pin 12345 ssn 123456789"),
         ("4", "clean text, no pii at all")],
        "doc_id string, text string")
    got = {r.doc_id: r for r in pii_scan(docs).collect()}
    assert (got["1"].n_email, got["1"].n_pii) == (2, 2)
    assert (got["2"].n_ipv4, got["2"].n_email) == (2, 0)
    # 16-digit card + 9-digit ssn hit the long-run rule; the 5-digit pin
    # and dotted version numbers do not
    assert (got["3"].n_digit_runs, got["3"].n_pii) == (2, 2)
    assert got["4"].n_pii == 0


def test_gates_are_row_local(spark):
    """Both gates are pure row-local expressions: no Exchange."""
    from parquet_cpp_spark.functions.text import pii_scan, repetition_stats

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    for df in (repetition_stats(docs), pii_scan(docs)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
