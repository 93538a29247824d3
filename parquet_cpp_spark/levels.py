"""Dremel definition/repetition levels for the ``tokens: array<int32>`` column.

The input-hint schema has one REPEATED INT32 leaf (``tokens.element``) with
max_repetition_level = 1 and max_definition_level = 1 (the list itself is
REQUIRED, its elements are REQUIRED; an empty list is encoded as a single
position with def = 0). This mirrors how the reference writes REPEATED
columns (``/root/reference/src/parquet/column_writer.cc:616-629``: rep 0
delimits a record) and how the Arrow layer derives levels from offsets
(``/root/reference/src/parquet/arrow/writer.cc:71-262``).

Levels are derived from row lengths fully vectorized (no per-row Python) and
coded with the RLE hybrid behind a u32 length prefix, like V1 data pages
(``column_writer.cc:331-352``).
"""

from __future__ import annotations

import numpy as np

MAX_DEF_LEVEL = 1
MAX_REP_LEVEL = 1


def levels_from_lengths(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(rep_levels, def_levels) from per-row token counts.

    Each row emits max(len, 1) level positions: rep = 0 at the row start,
    1 for continuations; def = 1 for real values, 0 for the empty-list marker.
    """
    lengths = np.ascontiguousarray(lengths, dtype=np.int64)
    slots = np.maximum(lengths, 1)
    total = int(slots.sum())
    # int8: levels are tiny ints; narrow dtype keeps the RLE pass cheap on
    # memory bandwidth (one level slot per token)
    rep = np.ones(total, dtype=np.int8)
    starts = np.zeros(len(lengths), dtype=np.int64)
    np.cumsum(slots[:-1], out=starts[1:])
    rep[starts] = 0
    d = np.ones(total, dtype=np.int8)
    empty_rows = starts[lengths == 0]
    d[empty_rows] = 0
    return rep, d


def lengths_from_levels(rep: np.ndarray, deflev: np.ndarray) -> np.ndarray:
    """Reconstruct per-row token counts: rep==0 starts a record
    (``RecordReader::DelimitRecords``,
    ``/root/reference/src/parquet/arrow/record_reader.cc:144``); positions
    with def==0 contribute no value."""
    starts = np.flatnonzero(rep == 0)
    n_rows = len(starts)
    bounds = np.concatenate((starts, [len(rep)]))
    # values per record = count of def==1 positions in the record
    cum_def = np.concatenate(([0], np.cumsum(deflev == 1)))
    return (cum_def[bounds[1:]] - cum_def[bounds[:-1]]).astype(np.int64)
