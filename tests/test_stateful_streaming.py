"""Stateful streaming dedup + watermarked windowed aggregation tests."""

import os

import pytest

pyspark = pytest.importorskip("pyspark")

from pyspark.sql import functions as F

from parquet_cpp_spark.streaming.stateful_dedup import streaming_dedup
from parquet_cpp_spark.streaming.windows import (EVENTS_SCHEMA,
                                                 batch_event_counts,
                                                 windowed_event_counts)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from parquet_cpp_spark.session import get_spark
    return get_spark(master="local[4]", app_name="pcs-state",
                     shuffle_partitions=4)


def test_streaming_dedup_across_batches(spark, tmp_path):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")) \
        .select("doc_id", "text")
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    # wave 1: first 200 docs; wave 2: ALL docs (so wave-1 content re-arrives)
    docs.filter(F.col("doc_id") < 200).write.parquet(in_dir)
    docs.write.mode("append").parquet(in_dir)

    stream = (spark.readStream.schema("doc_id bigint, text string")
              .option("maxFilesPerTrigger", "1").parquet(in_dir))
    deduped = streaming_dedup(stream)
    q = (deduped.writeStream.format("parquet")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = spark.read.parquet(out_dir)
    n_unique_contents = docs.select(F.md5("text")).distinct().count()
    assert got.count() == n_unique_contents  # duplicates across batches dropped
    assert got.select("content_hash").distinct().count() == n_unique_contents


def test_windowed_counts_match_batch(spark, tmp_path):
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    in_dir = str(tmp_path / "ev")
    ev.write.parquet(in_dir)
    stream = (spark.readStream.schema(EVENTS_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(in_dir))
    out_dir = str(tmp_path / "win")
    q = (windowed_event_counts(stream).writeStream.format("parquet")
         .outputMode("append")
         .option("path", out_dir)
         .option("checkpointLocation", str(tmp_path / "wckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r.window_start, r.event_type): (r.n, r.first_event)
           for r in spark.read.parquet(out_dir).collect()}
    want = {(r.window_start, r.event_type): (r.n, r.first_event)
            for r in batch_event_counts(ev).collect()}
    # append mode only emits windows the watermark closed; all emitted
    # windows must match batch exactly, and most windows must have closed
    assert got and all(want[k] == v for k, v in got.items())
    assert len(got) >= len(want) * 0.5


class _FakeState:
    """Minimal GroupState stand-in for contract-testing the dedup fn."""

    def __init__(self):
        self._val = None

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v


def test_dedup_state_is_bounded():
    """State bytes per bucket must stay O(bloom size) = CONSTANT across
    batches, not O(seen history) (round-2 verdict: the old list-of-hashes
    state grew without bound and was rewritten every batch)."""
    import hashlib

    import pandas as pd

    from parquet_cpp_spark.streaming.stateful_dedup import make_dedup_fn
    fn = make_dedup_fn(capacity=4096, fpp=0.01)
    state = _FakeState()
    sizes = []
    total_out = 0
    for batch in range(8):
        hashes = [hashlib.md5(f"doc-{batch}-{i}".encode()).hexdigest()
                  for i in range(500)]
        pdf = pd.DataFrame({"doc_id": [f"{batch}-{i}" for i in range(500)],
                            "content_hash": hashes})
        out = list(fn(("ab",), [pdf], state))
        total_out += sum(len(o) for o in out)
        n_seen, blob = state.get
        sizes.append(len(blob))
    assert len(set(sizes)) == 1, f"state size grew: {sizes}"
    assert state.get[0] == total_out
    # duplicates across batches are still dropped
    dup = pd.DataFrame({"doc_id": ["dup"],
                        "content_hash": [hashlib.md5(
                            b"doc-0-0").hexdigest()]})
    out = list(fn(("ab",), [dup], state))
    assert sum(len(o) for o in out) == 0


def test_dedup_fn_within_batch_exact():
    """Within one batch the dedup is exact (set-based), independent of the
    bloom: repeated hashes in one pdf emit once."""
    import pandas as pd

    from parquet_cpp_spark.streaming.stateful_dedup import make_dedup_fn
    fn = make_dedup_fn()
    state = _FakeState()
    pdf = pd.DataFrame({"doc_id": ["a", "b", "c"],
                        "content_hash": ["ff" * 16, "ff" * 16, "ee" * 16]})
    out = pd.concat(list(fn(("ff",), [pdf], state)))
    assert list(out["doc_id"]) == ["a", "c"]
