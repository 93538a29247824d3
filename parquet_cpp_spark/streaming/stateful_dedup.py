"""Custom stateful streaming operator: first-seen document dedup.

``applyInPandasWithState`` keeps per-group (content-hash prefix) state
across micro-batches, so duplicates are dropped even when they arrive in
different batches — the streaming analog of exact_dedup. Grouping by a hash
*prefix* spreads state across executors (65536 prefix buckets of roughly
uniform size, because the key is a hash).

State is a FIXED-SIZE split-block Bloom filter per bucket (the same kernel
the chunk writer uses for point-lookup pruning, kernels/bloom.py — the
reference's BlockSplitBloomFilter, bloom_filter.h:119-240) plus a seen
count: state bytes per bucket are O(bloom_bytes) = constant, not O(seen
history), and the per-batch state rewrite cost no longer grows with the
stream. The trade is a documented false-positive rate: a never-seen doc is
dropped with probability ~fpp once the bucket holds ~capacity keys (for
training-data dedup, rare over-dedup is the safe direction). Size the
capacity so capacity * 65536 buckets covers the expected corpus: the
default (64 Ki keys/bucket at 1% fpp ~= 79 KiB/bucket) covers ~4·10^9 docs;
at 10^12 docs raise prefix_len to 6 (16M buckets).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id string, content_hash string"
STATE_SCHEMA = "n_seen bigint, bloom binary"

DEFAULT_CAPACITY = 64 * 1024
DEFAULT_FPP = 0.01


def make_dedup_fn(capacity: int = DEFAULT_CAPACITY, fpp: float = DEFAULT_FPP):
    """Build the applyInPandasWithState function with a fixed bloom size."""

    def _dedup_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
                  state: GroupState) -> Iterator[pd.DataFrame]:
        from ..kernels.bloom import BlockSplitBloomFilter, optimal_num_bytes

        if state.exists:
            n_seen, blob = state.get
            bf = BlockSplitBloomFilter.deserialize(bytes(blob))
        else:
            n_seen = 0
            bf = BlockSplitBloomFilter(optimal_num_bytes(capacity, fpp))
        frames = []
        for pdf in pdfs:
            if not len(pdf):
                continue
            raws = [bytes.fromhex(h) for h in pdf["content_hash"]]
            known = bf.check_bytes(raws)  # vectorized cross-batch check
            batch_seen: set[str] = set()  # exact within-batch dedup
            keep = []
            for i, (h, k) in enumerate(zip(pdf["content_hash"], known)):
                if not k and h not in batch_seen:
                    batch_seen.add(h)
                    keep.append(i)
            if keep:
                bf.insert_bytes([raws[i] for i in keep])
                n_seen += len(keep)
                frames.append(pdf.iloc[keep][["doc_id", "content_hash"]])
        state.update((n_seen, bf.serialize()))
        if frames:
            yield pd.concat(frames, ignore_index=True)
        else:
            yield pd.DataFrame({"doc_id": pd.Series(dtype=object),
                                "content_hash": pd.Series(dtype=object)})

    return _dedup_fn


def streaming_dedup(stream_df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", prefix_len: int = 4,
                    capacity: int = DEFAULT_CAPACITY,
                    fpp: float = DEFAULT_FPP) -> DataFrame:
    """stream of documents -> stream of first-seen docs (exact content;
    bounded per-bucket state, see module docstring for the fpp trade)."""
    from ..shipping import ensure_shipped
    ensure_shipped(stream_df.sparkSession)
    hashed = stream_df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"))
    keyed = hashed.withColumn(
        "bucket", F.substring("content_hash", 1, prefix_len))
    return (keyed.groupBy("bucket")
            .applyInPandasWithState(make_dedup_fn(capacity, fpp),
                                    OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
