"""Arrow-native decode: chunk rows -> original rows with zero object churn.

The pandas decode path (operators.decode) pays np.split into one tiny ndarray
per row plus pandas->Arrow list re-conversion — ~2M Python objects per
million rows. Here the token column is rebuilt as a single
``pa.ListArray.from_arrays(offsets, values)`` (two buffer writes), mirroring
how the reference's Arrow layer reconstructs list columns from rep levels +
values (``/root/reference/src/parquet/arrow/record_reader.cc:384-420``).

Grouping: a hash repartition on part_id guarantees every partition's chunk
rows land in one task; the task then decodes each part it holds.
"""

from __future__ import annotations

import numpy as np

from .. import chunk as chunkmod
from .decode import DECODED_SCHEMA


def _strings(values):
    """byte_array view/list -> pa.StringArray (zero-copy from the view's
    buffers; 32-bit offsets cap one partition's column at 2 GiB, same bound
    as the list-offset check below)."""
    import pyarrow as pa

    from ..kernels import ba
    if isinstance(values, ba.ByteArrayView):
        return ba.to_arrow(values).cast(pa.string())
    return pa.array(values, type=pa.binary()).cast(pa.string())


def _decode_part(part_id: int, cols: dict):
    import pyarrow as pa

    tok = cols["tokens"]
    lengths = tok.row_lengths
    flat = np.asarray(tok.values, dtype=np.int32)
    if len(flat) >= (1 << 31):
        raise ValueError("partition too large for int32 list offsets; "
                         "lower the partition size")
    offsets = np.zeros(len(lengths) + 1, dtype=np.int32)
    np.cumsum(lengths, out=offsets[1:])
    tokens_arr = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()),
        pa.array(flat, type=pa.int32()))
    n = tok.n_rows
    return pa.RecordBatch.from_arrays([
        pa.array(np.full(n, part_id, dtype=np.int64), type=pa.int64()),
        _strings(cols["doc_id"].values),
        tokens_arr,
        pa.array(np.asarray(cols["n_tok"].values, dtype=np.int32),
                 type=pa.int32()),
        _strings(cols["source"].values),
    ], names=["part_id", "doc_id", "tokens", "n_tok", "source"])


def decode_chunks_arrow(chunks_df, part_col: str = "part_id",
                        assume_colocated: bool = False):
    """Chunk DataFrame -> reconstructed token table (Arrow fast path).

    ``assume_colocated=True`` skips the blob shuffle entirely: valid when
    the chunk rows of each partition are adjacent in one input split, which
    is how our sinks write them (one task's chunk set per file). The
    assumption is self-checking — a split partition decodes with a missing
    column and fails loudly (KeyError on 'tokens'/'doc_id') rather than
    producing wrong rows, so callers can fall back to the shuffled path.
    """
    import pyspark.sql.functions as F  # noqa: F401

    from ..shipping import ensure_shipped
    ensure_shipped(chunks_df.sparkSession)

    def task(batches):
        import pyarrow as pa

        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list)
        part_ids = tbl.column("part_id").to_numpy(zero_copy_only=False)
        cols = tbl.column("col").to_pylist()
        blobs = tbl.column("blob").to_pylist()
        by_part: dict[int, dict] = {}
        for pid, col, blob in zip(part_ids.tolist(), cols, blobs):
            try:
                by_part.setdefault(pid, {})[col] = chunkmod.decode_chunk(blob)
            except Exception as exc:
                raise ValueError(
                    f"corrupt chunk: part_id={pid} col={col!r}: {exc}"
                ) from exc
        for pid in sorted(by_part):
            yield _decode_part(pid, by_part[pid])

    src = chunks_df if assume_colocated else chunks_df.repartition(part_col)
    return src.mapInArrow(task, schema=DECODED_SCHEMA)
