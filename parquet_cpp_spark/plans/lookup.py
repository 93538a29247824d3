"""Point lookup with chunk pruning: min/max stats + bloom filters.

The reference emits filter-support metadata (min/max statistics
``statistics.h:34-82``, split-block blooms ``bloom_filter.h:119-240``) so
scanners can skip chunks; Catalyst does the same with parquet footers. Here
the chunk DataFrame *is* the metadata table: a lookup first prunes on the
stats columns (plain Catalyst filters over the tiny metadata projection),
then drops the surviving blooms into a pandas UDF check, and only decodes
the partitions that may contain the key. At 100 TB this is the difference
between decoding everything and decoding a handful of chunks.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

from ..operators import decode_arrow as decode_arrow_op


def prune_partitions(chunks_df: DataFrame, column: str, key: str) -> DataFrame:
    """part_ids whose `column` chunk may contain `key` (stats + bloom)."""
    meta = (chunks_df.filter(F.col("col") == column)
            .select("part_id", "min_val", "max_val", "bloom"))
    in_range = meta.filter(
        (F.col("min_val").isNull()) |
        ((F.col("min_val") <= key) & (F.col("max_val") >= key)))

    @F.pandas_udf(T.BooleanType())
    def bloom_may_contain(bloom: pd.Series) -> pd.Series:
        from ..kernels import bloom as bloom_mod
        kb = key.encode("utf-8")
        out = []
        for b in bloom:
            if b is None:
                out.append(True)  # no bloom -> cannot prune
            else:
                bf = bloom_mod.BlockSplitBloomFilter.deserialize(bytes(b))
                out.append(bool(bf.check_bytes([kb])[0]))
        return pd.Series(out)

    return in_range.filter(bloom_may_contain(F.col("bloom"))) \
        .select("part_id")


def point_lookup(chunks_df: DataFrame, doc_id: str) -> DataFrame:
    """Decode only the partitions that may contain ``doc_id`` and return the
    matching rows."""
    parts = prune_partitions(chunks_df, "doc_id", doc_id)
    pruned = chunks_df.join(F.broadcast(parts), "part_id")
    return decode_arrow_op.decode_chunks_arrow(pruned) \
        .filter(F.col("doc_id") == doc_id)
