"""Custom stateful streaming operator: first-seen document dedup.

``applyInPandasWithState`` keeps a per-group (content-hash prefix) state of
seen hashes across micro-batches, so duplicates are dropped even when they
arrive in different batches — the streaming analog of exact_dedup. Grouping
by a hash *prefix* bounds each group's state and spreads it across
executors (state skew control at 10^12-doc scale: 65536 prefix buckets of
roughly uniform size, because the key is a hash).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "doc_id string, content_hash string"
STATE_SCHEMA = "seen array<string>"


def _dedup_fn(key: tuple, pdfs: Iterable[pd.DataFrame],
              state: GroupState) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    out_ids, out_hashes = [], []
    for pdf in pdfs:
        for doc_id, h in zip(pdf["doc_id"], pdf["content_hash"]):
            if h not in seen:
                seen.add(h)
                out_ids.append(doc_id)
                out_hashes.append(h)
    state.update((list(seen),))
    yield pd.DataFrame({"doc_id": out_ids, "content_hash": out_hashes})


def streaming_dedup(stream_df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    prefix_len: int = 4) -> DataFrame:
    """stream of documents -> stream of first-seen docs (exact content)."""
    from ..shipping import ensure_shipped
    ensure_shipped(stream_df.sparkSession)
    hashed = stream_df.select(
        F.col(id_col).cast("string").alias("doc_id"),
        F.md5(F.col(text_col)).alias("content_hash"))
    keyed = hashed.withColumn(
        "bucket", F.substring("content_hash", 1, prefix_len))
    return (keyed.groupBy("bucket")
            .applyInPandasWithState(_dedup_fn, OUT_SCHEMA, STATE_SCHEMA,
                                    "append", GroupStateTimeout.NoTimeout))
