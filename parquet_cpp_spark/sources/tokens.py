"""Token-table sources.

Three ways to obtain the north-rule input table
``(doc_id: string, tokens: array<int32>, n_tok: int32, source: string)``:

1. ``tokens_from_documents`` — a deterministic, SQL-expressible tokenization
   of the driver's ``documents`` table. Both the Spark expression and the
   DuckDB oracle below compute the exact same arrays, so encode->decode
   round-trip queries can be checked against a DuckDB identity oracle.
2. ``synthesize_tokens_parquet`` — seeded numpy generator (FIXTURES.md F1-F3
   profiles) for bench-scale data; writes parquet via pyarrow.
3. ``read_tokens`` — read an existing table, trying Iceberg first (the
   north-rule production source) and falling back to parquet (this sandbox
   carries no Iceberg runtime).
"""

from __future__ import annotations

import os

import numpy as np

# Deterministic word -> token-id map, expressible identically in Spark SQL
# and DuckDB SQL (pure arithmetic on length/first-codepoint; no engine hash).
_TOKEN_EXPR_SPARK = (
    "transform(split(text, ' '), "
    "w -> CAST((length(w) * 2654435761 + ascii(w)) % 32768 AS INT))"
)
_TOKEN_EXPR_DUCKDB = (
    "list_transform(string_split(text, ' '), "
    "w -> CAST((length(w) * 2654435761 + ascii(w)) % 32768 AS INTEGER))"
)


def tokens_from_documents_sql(sf_dir: str, num_parts: int = 8) -> str:
    """Spark SQL producing the token table from ``{sf_dir}/documents.parquet``
    with a deterministic partition key (doc_id is int64 in the testdata)."""
    return f"""
        SELECT CAST(doc_id AS STRING) AS doc_id,
               {_TOKEN_EXPR_SPARK} AS tokens,
               CAST(size(split(text, ' ')) AS INT) AS n_tok,
               source,
               doc_id % {num_parts} AS part_id
        FROM parquet.`{os.path.join(sf_dir, 'documents.parquet')}`
    """


def tokens_oracle_sql(num_parts: int = 8) -> str:
    """DuckDB SQL computing the identical token table on the pre-registered
    ``documents`` view — the identity oracle for round-trip queries.

    The token array is projected as a per-row md5 digest of the
    space-joined values (``tok_hash``) rather than the raw ``array<int32>``:
    the correctness harness canonicalizes by sorting column values, which
    list columns cannot support, while a digest keeps the full sensitivity
    of the oracle (any single corrupted token flips the hash). The
    ``coalesce`` matters: DuckDB's ``array_to_string`` yields NULL on an
    empty list where Spark's ``array_join`` yields ''."""
    return f"""
        SELECT CAST(doc_id AS VARCHAR) AS doc_id,
               md5(coalesce(array_to_string({_TOKEN_EXPR_DUCKDB}, ' '), ''))
                   AS tok_hash,
               CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tok,
               source
        FROM documents
    """


def tokens_from_documents(spark, sf_dir: str, num_parts: int = 8):
    return spark.sql(tokens_from_documents_sql(sf_dir, num_parts))


# ---------------------------------------------------------------------------
# Deterministic synthesis at bench scale (FIXTURES.md F1-F3)
# ---------------------------------------------------------------------------

SOURCES = ["web", "books", "code", "news", "wiki", "forum", "paper", "legal",
           "chat", "mail", "docs", "misc"]
# Zipf-ish skew over sources: `web` dominates (drives the salting story).
_SOURCE_WEIGHTS = np.array([0.42, 0.14, 0.10, 0.08, 0.07, 0.05, 0.04, 0.03,
                            0.025, 0.02, 0.015, 0.01])


def synthesize_tokens_table(n_rows: int, seed: int = 42,
                            vocab: int = 262144, avg_len: int = 256,
                            id_offset: int = 0):
    """Deterministic in-memory token table as a pyarrow Table.

    Row-length profile: mixed uniform with 1% empties and a few jumbo rows.
    Element profile varies by source bucket to exercise every codec path:
    low-card, sorted (delta), runs (RLE), and full-vocab uniform (PLAIN/pack).
    """
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    lengths = rng.integers(1, 2 * avg_len, n_rows).astype(np.int64)
    lengths[rng.random(n_rows) < 0.01] = 0
    jumbo = rng.integers(0, n_rows, max(1, n_rows // 10000))
    lengths[jumbo] = 25000

    src_idx = rng.choice(len(SOURCES), n_rows,
                         p=_SOURCE_WEIGHTS / _SOURCE_WEIGHTS.sum())
    total = int(lengths.sum())
    flat = np.empty(total, dtype=np.int32)
    offsets = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    # profile per source-class: 0 low-card, 1 sorted, 2 runs, 3 uniform
    profile = src_idx % 4
    starts, ends = offsets[:-1], offsets[1:]
    for p in range(4):
        rows = np.flatnonzero((profile == p) & (lengths > 0))
        if not len(rows):
            continue
        sizes = lengths[rows]
        tot = int(sizes.sum())
        if p == 0:
            vals = rng.integers(0, 512, tot).astype(np.int32)
        elif p == 1:
            deltas = rng.integers(0, 7, tot).astype(np.int64)
            vals = np.cumsum(deltas) % vocab
            vals = vals.astype(np.int32)
        elif p == 2:
            base = rng.integers(0, 64, (tot + 31) // 32).astype(np.int32)
            vals = np.repeat(base, 32)[:tot]
        else:
            vals = rng.integers(0, vocab, tot).astype(np.int32)
        pos = 0
        for r, sz in zip(rows.tolist(), sizes.tolist()):
            flat[starts[r]: ends[r]] = vals[pos: pos + sz]
            pos += sz

    doc_ids = [f"corpus/shard{i % 997:03d}/doc-{i:012d}"
               for i in range(id_offset, id_offset + n_rows)]
    tokens_arr = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()),
                                          pa.array(flat, type=pa.int32()))
    return pa.table({
        "doc_id": pa.array(doc_ids, type=pa.string()),
        "tokens": tokens_arr,
        "n_tok": pa.array(lengths.astype(np.int32), type=pa.int32()),
        "source": pa.array([SOURCES[i] for i in src_idx], type=pa.string()),
    })


def synthesize_tokens_parquet(path: str, n_rows: int, seed: int = 42,
                              row_group_size: int = 100_000,
                              slab_rows: int = 250_000) -> str:
    """Write the synthetic table to parquet (cached: skips if present).
    Streams in slabs so billion-token tables don't need table-sized RAM;
    each slab gets an independent seeded RNG, so output is deterministic
    for a given (n_rows, seed, slab_rows)."""
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    writer = None
    try:
        for start in range(0, n_rows, slab_rows):
            rows = min(slab_rows, n_rows - start)
            tbl = synthesize_tokens_table(rows, seed + start // slab_rows,
                                          id_offset=start)
            if writer is None:
                writer = pq.ParquetWriter(tmp, tbl.schema)
            for rg_start in range(0, rows, row_group_size):
                writer.write_table(tbl.slice(rg_start, row_group_size),
                                   row_group_size=row_group_size)
        if writer is not None:
            writer.close()
            writer = None
        os.replace(tmp, path)
    finally:
        if writer is not None:
            writer.close()
    return path


def read_tokens(spark, path: str, fmt: str = "auto"):
    """Iceberg-first reader: the production source per the north rule is an
    Iceberg table; this sandbox has no Iceberg jars, so fall back to parquet
    transparently (same DataFrame shape either way)."""
    if fmt in ("auto", "iceberg"):
        try:
            return spark.read.format("iceberg").load(path)
        except Exception:
            if fmt == "iceberg":
                raise
    return spark.read.parquet(path)
