"""Physical-plan shape assertions — the .explain() discipline as tests:
filters push to the parquet scan, metadata queries prune the blob column,
small sides broadcast, and the direct source shuffles only descriptors."""

import os

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def spark():
    from parquet_cpp_spark.session import get_spark
    return get_spark(master="local[4]", app_name="pcs-plans",
                     shuffle_partitions=4)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    q = docs.filter(F.col("doc_id") == 42).select("doc_id", "source")
    plan = _plan(q)
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters")[1][:200]


def test_column_pruning_reaches_scan(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    q = docs.select("doc_id").groupBy().count()
    plan = _plan(q)
    # ReadSchema must not include the wide text column
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "text" not in read_schema


def test_chunk_metadata_query_prunes_blob(spark, tmp_path):
    from parquet_cpp_spark.operators.encode_arrow import encode_scan_local
    from parquet_cpp_spark.sources import tokens as T
    src = T.tokens_from_documents(spark, SF_DIR, 4)
    p = str(tmp_path / "chunks")
    encode_scan_local(src).write.parquet(p)
    meta = (spark.read.parquet(p)
            .groupBy("col", "codec").agg(F.sum("enc_bytes").alias("b")))
    plan = _plan(meta)
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "blob" not in read_schema  # stats queries never touch payloads
    assert meta.count() > 0


def test_point_lookup_uses_broadcast(spark):
    from parquet_cpp_spark.operators import encode as encode_op
    from parquet_cpp_spark.plans import lookup
    from parquet_cpp_spark.sources import tokens as T
    src = T.tokens_from_documents(spark, SF_DIR, 8)
    chunks = encode_op.encode_df(src, 8, bloom_columns={"doc_id"})
    parts = lookup.prune_partitions(chunks, "doc_id", "42")
    pruned = chunks.join(F.broadcast(parts), "part_id")
    assert "Broadcast" in _plan(pruned)


def test_similarity_broadcasts_probes(spark):
    from parquet_cpp_spark.functions import similarity
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    q = similarity.topk_inner_product_quantized(emb, [0, 1], k=3)
    assert "Broadcast" in _plan(q)


def test_direct_source_shuffles_only_descriptors(spark):
    """The direct source must never move row data through an exchange.
    Since the parallelize-with-slices change it moves NOTHING through one:
    descriptors are sliced at creation, so the plan is exchange-free."""
    from parquet_cpp_spark.sources.parquet_direct import encode_parquet_direct
    chunks = encode_parquet_direct(
        spark, os.path.join(SF_DIR, "documents.parquet"),
        columns={"text": "byte_array"})
    plan = _plan(chunks)
    assert "Exchange" not in plan, plan


def test_minhash_signatures_zero_shuffle(spark):
    """MinHash signatures are row-local array expressions: the plan must
    contain NO Exchange (the old explode+groupBy shuffled O(words) rows)."""
    from parquet_cpp_spark.functions import dedup
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = _plan(dedup.minhash_signatures(docs))
    assert "Exchange" not in plan, plan


def test_simhash_zero_shuffle(spark):
    """SimHash is a row-local fold over the word array: no Exchange."""
    from parquet_cpp_spark.functions import dedup
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    plan = _plan(dedup.simhash(docs))
    assert "Exchange" not in plan, plan


def test_bucketed_join_colocates(spark, tmp_path):
    """Bucketed tables joined on the bucket key need NO exchange: the
    100-TB co-located-join strategy (bucketBy at write time amortizes the
    shuffle across every later join). Broadcast is disabled so the plan
    can't cheat around the sort-merge path."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        cust = spark.read.parquet(os.path.join(SF_DIR, "customer.parquet"))
        (orders.write.mode("overwrite").bucketBy(8, "o_custkey")
         .sortBy("o_custkey").saveAsTable("t_orders_b"))
        (cust.write.mode("overwrite").bucketBy(8, "c_custkey")
         .sortBy("c_custkey").saveAsTable("t_cust_b"))
        j = (spark.table("t_orders_b")
             .join(spark.table("t_cust_b"),
                   F.col("o_custkey") == F.col("c_custkey"))
             .groupBy("c_custkey").count())
        plan = _plan(j)
        join_part = plan.split("SortMergeJoin")[0] \
            if "SortMergeJoin" in plan else plan
        assert "Exchange hashpartitioning(o_custkey" not in plan, plan
        assert "Exchange hashpartitioning(c_custkey" not in plan, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS t_orders_b")
        spark.sql("DROP TABLE IF EXISTS t_cust_b")


def test_neardup_jaccard_bucket_cap(spark):
    """The LSH band gate must bound per-bucket candidates: a hot bucket
    (here: many near-identical docs) is SKIPPED, not exploded into
    O(bucket^2) pairs, and the skip is enumerable via the dropped-buckets
    audit — no silent truncation."""
    from parquet_cpp_spark.functions import dedup

    rows = [(i, "common words shared by every doc in the hot cluster")
            for i in range(50)]           # one hot band bucket of 50 docs
    rows += [(100 + i, f"w{i}a w{i}b w{i}c w{i}d w{i}e w{i}f")
             for i in range(10)]      # pairwise-disjoint word sets
    rows += [(200, "twin pair one two three"), (201, "twin pair one two three")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    pairs = dedup.neardup_jaccard(docs, bucket_cap=32).collect()
    ids = {r.a_id for r in pairs} | {r.b_id for r in pairs}
    # the hot cluster (0..49) is capped out; the twin pair survives
    assert not any(i < 100 for i in ids)
    assert {(r.a_id, r.b_id) for r in pairs} == {(200, 201)}

    dropped = dedup.neardup_jaccard_dropped_buckets(
        docs, bucket_cap=32).collect()
    assert dropped and all(r.n_docs == 50 for r in dropped)

    # raising the cap re-admits the cluster: the gate, not the scorer,
    # was the bound
    pairs_hi = dedup.neardup_jaccard(docs, bucket_cap=64).collect()
    assert sum(1 for r in pairs_hi if r.a_id < 100) == 50 * 49 // 2


def test_decontaminate_broadcasts_bench_and_flags_verbatim(spark):
    """Decontamination: the benchmark shingle set is broadcast (corpus side
    streams), a verbatim inclusion is flagged with a hit per shingle
    position, and clean docs are absent."""
    from parquet_cpp_spark.functions import dedup
    bench = spark.createDataFrame(
        [(1000, "the quick brown fox jumps over the lazy dog", "eval")],
        "doc_id bigint, text string, source string")
    docs = spark.createDataFrame(
        [(1, "intro text then the quick brown fox jumps over it", "web"),
         (2, "totally unrelated words without any overlap here", "web"),
         (3, "the quick brown fox jumps over the lazy dog", "web")],
        "doc_id bigint, text string, source string")
    out = dedup.decontaminate(docs, bench)
    assert "Broadcast" in _plan(out)
    got = {r.doc_id: r.n_hits for r in out.collect()}
    # doc 3 is verbatim: 9 words -> 7 shingles, all colliding
    assert got[3] == 7
    # doc 1 shares "the quick brown fox jumps over" (6 words) -> 4 shingles
    assert got[1] == 4
    assert 2 not in got


def test_decontaminate_shuffle_path_identical_and_no_broadcast(spark):
    """Big-eval-corpus path: when the bench shingle set exceeds
    broadcast_limit (auto) or strategy='shuffle' is forced, both sides
    hash-partition on the shingle — no broadcast of the bench side — and
    results are IDENTICAL to the broadcast path on the same inputs."""
    from parquet_cpp_spark.functions import dedup
    rows = [(1000 + i,
             f"sequence alpha {i} beta gamma delta common tail phrase",
             "eval") for i in range(40)]
    bench = spark.createDataFrame(
        rows, "doc_id bigint, text string, source string")
    docs = spark.createDataFrame(
        [(1, "sequence alpha 7 beta gamma delta common tail phrase", "web"),
         (2, "no overlap with anything at all in this one", "web"),
         (3, "ends with delta common tail phrase", "web")],
        "doc_id bigint, text string, source string")
    base = {(r.doc_id, r.n_hits)
            for r in dedup.decontaminate(docs, bench).collect()}
    forced = dedup.decontaminate(docs, bench, strategy="shuffle")
    assert "Broadcast" not in _plan(forced)
    assert {(r.doc_id, r.n_hits) for r in forced.collect()} == base
    # auto flips to shuffle once the shingle count passes the limit
    auto = dedup.decontaminate(docs, bench, broadcast_limit=10)
    assert "Broadcast" not in _plan(auto)
    assert {(r.doc_id, r.n_hits) for r in auto.collect()} == base
    with pytest.raises(ValueError, match="unknown strategy"):
        dedup.decontaminate(docs, bench, strategy="bogus")


def test_selective_decode_prunes_parts(spark):
    """Chunk-format predicate pushdown: partitions whose chunk stats
    disprove the conjunction are never decoded (prune_parts_predicate
    over the metadata projection; broadcast semi join), and the residual
    Catalyst filter makes the result exact — identical to filtering the
    full decode."""
    from parquet_cpp_spark.plans import encode_job, lookup
    from parquet_cpp_spark.sources import tokens as T_

    src = T_.tokens_from_documents(spark, SF_DIR, 4)
    # part_id by n_tok band -> disjoint per-part n_tok stats, provably
    # prunable (the range-clustered layout a selective table would use)
    src = src.withColumn("part_id",
                         (F.col("n_tok") / F.lit(25)).cast("long"))
    chunks = encode_job.encode_pipeline(src, 4).cache()
    try:
        n_parts = chunks.select("part_id").distinct().count()
        pred = [("n_tok", "<", 30), ("source", "!=", "src3")]
        kept = lookup.prune_parts_predicate(chunks, pred).count()
        assert 0 < kept < n_parts          # stats actually pruned
        got = sorted(r.doc_id for r in
                     lookup.selective_decode(chunks, pred)
                     .select("doc_id").collect())
        want_df = encode_job.decode_pipeline(chunks).filter(
            (F.col("n_tok") < 30) & (F.col("source") != "src3"))
        want = sorted(r.doc_id for r in want_df.select("doc_id").collect())
        assert got == want and got
        # in-op + impossible conjunct
        assert lookup.prune_parts_predicate(
            chunks, [("n_tok", ">", 10 ** 6)]).count() == 0
        got_in = lookup.selective_decode(
            chunks, [("source", "in", ["src1", "src5"]),
                     ("n_tok", ">=", 90)]).count()
        want_in = encode_job.decode_pipeline(chunks).filter(
            F.col("source").isin("src1", "src5")
            & (F.col("n_tok") >= 90)).count()
        assert got_in == want_in
        with pytest.raises(ValueError, match="unsupported predicate op"):
            lookup.prune_parts_predicate(chunks, [("n_tok", "~", 1)])
    finally:
        chunks.unpersist()


def test_selective_decode_bloom_layer(spark):
    """String == terms consult the per-chunk blooms: a doc_id inside
    every chunk's [min,max] but absent from the corpus prunes ALL
    partitions via the bloom, while a present doc_id keeps its
    partition and decodes to exactly that row."""
    from parquet_cpp_spark.operators import encode_arrow
    from parquet_cpp_spark.plans import encode_job, lookup
    from parquet_cpp_spark.sources import tokens as T_

    src = T_.tokens_from_documents(spark, SF_DIR, 4)
    src = encode_job.add_part_id(src, 4)
    chunks = encode_arrow.encode_df_arrow(
        src, 4, bloom_columns={"doc_id"}).cache()
    try:
        n_parts = chunks.select("part_id").distinct().count()
        present = src.select("doc_id").first().doc_id
        # absent key lexicographically inside the stats range
        absent = present + "zz"
        kept = lookup.prune_parts_predicate(
            chunks, [("doc_id", "==", absent)]).count()
        assert kept == 0                      # bloom pruned everything
        kept_p = lookup.prune_parts_predicate(
            chunks, [("doc_id", "==", present)]).count()
        assert 1 <= kept_p < n_parts
        rows = lookup.selective_decode(
            chunks, [("doc_id", "==", present)]).collect()
        assert len(rows) == 1 and rows[0].doc_id == present
    finally:
        chunks.unpersist()


def test_prune_parts_predicate_edges(spark):
    """Review-pinned edges: (a) unknown predicate column fails loudly
    instead of silently pruning everything; (b) strict bounds on int64
    stats past 2^53 compare exactly (decimal path) instead of wrongly
    pruning after a double round."""
    from parquet_cpp_spark.plans import lookup

    big = 9007199254740992                        # 2^53
    meta = spark.createDataFrame(
        [(0, "x", str(big), str(big), 0, 10, None),
         (1, "x", "1", "5", 0, 10, None)],
        "part_id long, col string, min_val string, max_val string, "
        "null_count long, n_rows long, bloom binary")
    with pytest.raises(ValueError, match="no chunk metadata"):
        lookup.prune_parts_predicate(meta, [("nope", "==", 1)])
    # x < 2^53+1 is satisfiable in part 0 (x == 2^53); double rounding
    # would collapse both sides and prune it
    kept = {r.part_id for r in lookup.prune_parts_predicate(
        meta, [("x", "<", big + 1)]).collect()}
    assert kept == {0, 1}
    kept = {r.part_id for r in lookup.prune_parts_predicate(
        meta, [("x", ">", big)]).collect()}
    assert kept == set()                          # exactly nothing above
    kept = {r.part_id for r in lookup.prune_parts_predicate(
        meta, [("x", "==", big)]).collect()}
    assert kept == {0}


def test_duplicated_token_spans_one_shuffle_and_winnow_guarantee(spark):
    """Span dedup shuffles exactly once (the fingerprint groupBy — the
    shingle/winnow stage is row-local HOFs, no UDFs), and winnowing's
    guarantee holds: two docs sharing a run of >= k+w-1 tokens always
    share a fingerprint; docs shorter than k produce none."""
    from parquet_cpp_spark.functions import dedup

    # shared 11-token run (k=8, w=4 -> guaranteed hit) inside different
    # contexts, plus a short doc and an unrelated doc
    shared = list(range(100, 111))
    rows = [("a", [1, 2, 3] + shared + [4, 5]),
            ("b", [9, 8] + shared + [7]),
            ("c", [1, 2, 3]),                      # shorter than k
            ("d", [i * 3 for i in range(40)])]     # no shared span
    docs = spark.createDataFrame(
        [(i, t, len(t), "s") for i, t in rows],
        "doc_id string, tokens array<int>, n_tok int, source string")
    res = dedup.duplicated_token_spans(docs, k=8, w=4)
    plan = _plan(res)
    assert plan.count("Exchange") == 1, plan
    got = res.collect()
    assert got and all(r.n_docs == 2 and {r.first_doc, r.last_doc}
                       == {"a", "b"} for r in got)
    # the shared-run guarantee: at least one fingerprint from the run
    assert dedup.duplicated_token_spans(
        docs.filter("doc_id in ('c', 'd')"), k=8, w=4).count() == 0


def test_pack_documents_invariants(spark):
    """Boundary-respecting packing: no bin exceeds capacity unless it
    holds exactly one flagged oversize doc; bin ids are contiguous per
    partition; every doc appears exactly once; one shuffle."""
    from pyspark.sql import functions as F

    from parquet_cpp_spark.functions.packing import pack_documents
    from parquet_cpp_spark.sources import tokens as T

    src = T.tokens_from_documents(spark, SF_DIR, 4)
    res = pack_documents(src, 128).cache()
    try:
        assert res.count() == src.count()
        agg = res.groupBy("part_id", "bin_id").agg(
            F.sum("n_tok").alias("s"), F.max("oversize").alias("o"),
            F.count("*").alias("c"))
        assert agg.filter("s > 128 and not (o = 1 and c = 1)").count() == 0
        # oversize docs are ALWAYS alone in their bin
        assert agg.filter("o = 1 and c > 1").count() == 0
        # contiguous bin ids from 0 per partition
        bad = res.groupBy("part_id").agg(
            F.min("bin_id").alias("lo"), F.max("bin_id").alias("hi"),
            F.countDistinct("bin_id").alias("n"))
        assert bad.filter("lo != 0 or n != hi + 1").count() == 0
    finally:
        res.unpersist()
