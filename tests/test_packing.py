"""Sequence packing + mixture sampling: determinism, window shape, rates."""

import os

import numpy as np
import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F

from parquet_cpp_spark.functions import packing

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from parquet_cpp_spark.session import get_spark
    return get_spark(master="local[4]", app_name="pcs-pack",
                     shuffle_partitions=4)


@pytest.fixture(scope="module")
def tokens(spark):
    from parquet_cpp_spark.sources import tokens as tokens_src
    return tokens_src.tokens_from_documents(spark, SF_DIR, 4)


def test_pack_sequences_shape_and_content(spark, tokens):
    seq_len = 128
    packed = packing.pack_sequences(tokens, seq_len).collect()
    assert packed
    assert all(len(r.tokens) == seq_len for r in packed)
    # reconstruct one partition's stream by hand and compare
    part = packed[0].part_id
    docs = sorted(((int(r.doc_id), list(r.tokens))
                   for r in tokens.filter(F.col("part_id") == part)
                   .collect()))
    stream = []
    for _d, toks in docs:
        stream.append(packing.BOS_ID)
        stream.extend(toks)
    want = [stream[i * seq_len: (i + 1) * seq_len]
            for i in range(len(stream) // seq_len)]
    got = {r.seq_id: list(r.tokens) for r in packed
           if r.part_id == part}
    assert got == {i: w for i, w in enumerate(want)}


def test_pack_sequences_deterministic_under_repartition(spark, tokens):
    a = {(r.part_id, r.seq_id): tuple(r.tokens)
         for r in packing.pack_sequences(tokens, 256).collect()}
    b = {(r.part_id, r.seq_id): tuple(r.tokens)
         for r in packing.pack_sequences(tokens.repartition(7), 256)
         .collect()}
    assert a == b


def test_sample_mixture_rates_and_determinism(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    rates = {"src0": 1.0, "src1": 0.5}
    out = packing.sample_mixture(docs, rates)
    got = {(r.doc_id, r.source) for r in out.collect()}
    assert got == {(r.doc_id, r.source)
                   for r in packing.sample_mixture(
                       docs.repartition(5), rates).collect()}
    by_src = {s: n for s, n in out.groupBy("source").count().collect()}
    tot = {s: n for s, n in docs.groupBy("source").count().collect()}
    assert by_src.get("src0", 0) == tot["src0"]  # rate 1.0 keeps all
    assert set(by_src) <= {"src0", "src1"}  # unlisted sources dropped
    # rate 0.5 keeps roughly half (binomial over md5 buckets)
    frac = by_src.get("src1", 0) / tot["src1"]
    assert 0.2 <= frac <= 0.8, frac


def test_sample_mixture_zero_shuffle(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = packing.sample_mixture(docs, {"src0": 1.0}) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
