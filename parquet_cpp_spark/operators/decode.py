"""Decode operator: chunk rows -> original rows, one partition per group.

Inverse of ``operators.encode``: mirrors the reference's read path
(``/root/reference/src/parquet/file_reader.cc:322-374`` ScanFileContents +
``arrow/record_reader.cc:144`` record delimiting): decode each column blob,
split the flattened token values at cumsum(row_lengths) (== rep-level==0
boundaries), and reassemble the row table.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .. import chunk as chunkmod

DECODED_SCHEMA = ("part_id bigint, doc_id string, tokens array<int>, "
                  "n_tok int, source string")


def decode_group(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
    part_id = int(key[0])
    decoded: dict[str, chunkmod.DecodedChunk] = {}
    for col, blob in zip(pdf["col"], pdf["blob"]):
        try:
            decoded[col] = chunkmod.decode_chunk(bytes(blob))
        except Exception as exc:
            raise ValueError(
                f"corrupt chunk: part_id={part_id} col={col!r}: {exc}"
            ) from exc

    tok = decoded["tokens"]
    lengths = tok.row_lengths
    flat = np.asarray(tok.values, dtype=np.int32)
    token_rows = np.split(flat, np.cumsum(lengths)[:-1]) if len(lengths) \
        else []

    out = pd.DataFrame({
        "part_id": np.full(tok.n_rows, part_id, dtype=np.int64),
        "doc_id": _str_series(decoded["doc_id"].values),
        "tokens": token_rows,
        "n_tok": np.asarray(decoded["n_tok"].values, dtype=np.int32),
        "source": _str_series(decoded["source"].values),
    })
    return out


def _str_series(values):
    """byte_array view/list -> pandas str values (C decode path for views)."""
    from ..kernels import ba
    if isinstance(values, ba.ByteArrayView):
        import pyarrow as pa
        return ba.to_arrow(values).cast(pa.large_string()).to_pandas()
    return [b.decode("utf-8") for b in values]


def decode_chunks(chunks_df, part_col: str = "part_id"):
    """Chunk DataFrame -> reconstructed token-table DataFrame."""
    from ..shipping import ensure_shipped
    ensure_shipped(chunks_df.sparkSession)
    return chunks_df.groupBy(part_col).applyInPandas(
        decode_group, schema=DECODED_SCHEMA)
