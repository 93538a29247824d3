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


def _find_rows(blob, key: bytes):
    """Row indices whose doc_id == key, decoding only the pages whose
    [min, max] may contain it — the Skip/partial-read analog
    (/root/reference/src/parquet/column_reader.h:268-281)."""
    import pyarrow.compute as pc

    from .. import chunk as chunkmod
    from ..kernels import ba

    mv = memoryview(blob)
    if mv.format != "B":
        mv = mv.cast("B")
    hits: list[int] = []
    if mv[4] == chunkmod.VERSION_PAGED:
        for p in chunkmod.page_index(mv):
            if p["min"] is not None and not (p["min"] <= key <= p["max"]):
                continue
            dec = chunkmod.decode_chunk_rows(mv, p["row_start"],
                                             p["row_end"])
            eq = pc.indices_nonzero(pc.equal(ba.to_arrow(dec.values), key))
            hits.extend(p["row_start"] + int(i) for i in eq.to_pylist())
        return hits
    dec = chunkmod.decode_chunk(mv)
    vals = dec.values if isinstance(dec.values, ba.ByteArrayView) \
        else ba.from_list(list(dec.values))
    eq = pc.indices_nonzero(pc.equal(ba.to_arrow(vals), key))
    return [int(i) for i in eq.to_pylist()]


_SEL_OPS = ("==", "!=", "<", "<=", ">", ">=", "in",
            "is_null", "not_null")


def prune_parts_predicate(chunks_df: DataFrame, predicate) -> DataFrame:
    """part_ids that may satisfy a conjunction of ``(column, op, value)``
    terms (ops ``== != < <= > >= in is_null not_null``), pruning on the
    chunk DataFrame's OWN stats columns (min_val/max_val/null_count)
    with plain Catalyst filters over the tiny metadata projection — no
    blob is touched — plus a bloom layer for string ``==``/``in`` terms
    on bloom-carrying chunks (the same per-chunk split-block blooms
    ``point_lookup`` consults).
    Numeric values compare via a double cast of the canonical stat
    strings; string values compare lexicographically (matching
    compute_stats). A chunk with NULL stats is kept (can't prune);
    an all-null chunk (null_count == n_rows) is pruned for every
    comparison term (null-rejecting semantics). The manifest-level
    analog of the reference's stats-based filtering
    (statistics.h:34-82)."""
    # bounded collect: one row per distinct column name in the chunk
    # metadata — a typo'd predicate column must fail loudly, not
    # intersect the part set down to silent emptiness
    known = {r.col for r in chunks_df.select("col").distinct().collect()}
    parts = None
    for term in predicate:
        try:
            col, op, v = term
        except (TypeError, ValueError):
            raise ValueError(f"predicate term {term!r} is not "
                             "(column, op, value)")
        if col not in known:
            raise ValueError(f"predicate column {col!r} has no chunk "
                             f"metadata rows (have {sorted(known)})")
        if op == "=":
            op = "=="
        if op not in _SEL_OPS:
            raise ValueError(f"unsupported predicate op {op!r} "
                             f"(one of {_SEL_OPS})")
        if op in ("is_null", "not_null"):
            keep = (F.col("null_count") > 0) if op == "is_null" \
                else (F.col("null_count") < F.col("n_rows"))
            kept = (chunks_df.filter(F.col("col") == col).filter(keep)
                    .select("part_id"))
            parts = kept if parts is None else parts.join(kept, "part_id")
            continue
        vals = list(v) if op == "in" else [v]
        if op == "in" and not vals:
            raise ValueError(f"'in' predicate on {col!r} needs a "
                             "non-empty collection")
        numeric = isinstance(vals[0], (int, float)) \
            and not isinstance(vals[0], bool)

        def rng(mn, mx, lit):
            return {"==": (lit >= mn) & (lit <= mx),
                    "!=": ~((mn == mx) & (mn == lit)),
                    "<": mn < lit, "<=": mn <= lit,
                    ">": mx > lit, ">=": mx >= lit,
                    "in": (lit >= mn) & (lit <= mx)}[op]

        def any_rng(mn, mx, lits):
            cond = rng(mn, mx, lits[0])
            for lit in lits[1:]:
                cond = cond | rng(mn, mx, lit)
            return cond

        if numeric:
            mn_d = F.col("min_val").cast("double")
            mx_d = F.col("max_val").cast("double")
            in_range = any_rng(mn_d, mx_d, [F.lit(float(x)) for x in vals])
            if all(isinstance(x, int) for x in vals):
                # double rounds past 2^53 and can wrongly prune strict
                # bounds on wide int64 stats; OR in an exact decimal
                # compare (null on float-formatted stats -> no effect)
                mn_i = F.col("min_val").cast("decimal(38,0)")
                mx_i = F.col("max_val").cast("decimal(38,0)")
                exact = any_rng(mn_i, mx_i,
                                [F.lit(x).cast("decimal(38,0)")
                                 for x in vals])
                in_range = in_range | F.coalesce(exact, F.lit(False))
        else:
            in_range = any_rng(F.col("min_val"), F.col("max_val"),
                               [F.lit(str(x)) for x in vals])
        keep = (F.col("null_count") < F.col("n_rows")) \
            & (F.col("min_val").isNull() | in_range)
        kept = chunks_df.filter(F.col("col") == col).filter(keep)
        if op in ("==", "in") and not numeric \
                and "bloom" in chunks_df.columns:
            # bloom layer for string equality: keep only partitions
            # whose chunk bloom may contain SOME candidate (no bloom ->
            # cannot prune); same per-chunk blooms point_lookup uses
            keys = [x.encode() if isinstance(x, str) else bytes(x)
                    for x in vals]

            @F.pandas_udf(T.BooleanType())
            def _may_contain(bloom: pd.Series) -> pd.Series:
                from ..kernels import bloom as bloom_mod
                out = []
                for b in bloom:
                    if b is None:
                        out.append(True)
                    else:
                        bf = bloom_mod.BlockSplitBloomFilter.deserialize(
                            bytes(b))
                        out.append(bool(bf.check_bytes(keys).any()))
                return pd.Series(out)
            kept = kept.filter(_may_contain(F.col("bloom")))
        kept = kept.select("part_id")
        parts = kept if parts is None else parts.join(kept, "part_id")
    if parts is None:
        raise ValueError("empty predicate")
    return parts.distinct()


def selective_decode(chunks_df: DataFrame, predicate,
                     verify_checksums: bool = False) -> DataFrame:
    """Predicate-pushdown decode of a chunk dataset: partitions whose
    chunk stats disprove the conjunction are NEVER decoded
    (prune_parts_predicate, broadcast semi join — no shuffle), and the
    survivors get an exact Catalyst residual filter after decode. The
    chunk-format twin of ``record_assembly.read_parquet_dataset
    (predicate=...)``; at 100 TB a selective predicate over a
    range-clustered layout decodes only the matching slice."""
    from .encode_job import decode_pipeline
    parts = prune_parts_predicate(chunks_df, predicate)
    pruned = chunks_df.join(F.broadcast(parts), "part_id", "semi")
    out = decode_pipeline(pruned, verify_checksums=verify_checksums)
    cond = None
    for col, op, v in predicate:
        c = F.col(col)
        if op == "is_null":
            term = c.isNull()
        elif op == "not_null":
            term = c.isNotNull()
        elif op in ("in",):
            term = c.isin(*list(v))
        else:
            term = {"==": c == F.lit(v), "=": c == F.lit(v),
                    "!=": c != F.lit(v),
                    "<": c < F.lit(v), "<=": c <= F.lit(v),
                    ">": c > F.lit(v), ">=": c >= F.lit(v)}[op]
        cond = term if cond is None else cond & term
    return out.filter(cond)


def point_lookup(chunks_df: DataFrame, doc_id: str) -> DataFrame:
    """Return the rows matching ``doc_id``, decoding as little as possible:
    stats+bloom prune partitions; within a surviving partition, per-page
    min/max prune the doc_id pages; only the hit rows' pages of the other
    columns are decoded (decode_chunk_rows)."""
    from ..operators.decode import DECODED_SCHEMA
    from ..shipping import ensure_shipped
    ensure_shipped(chunks_df.sparkSession)

    parts = prune_partitions(chunks_df, "doc_id", doc_id)
    pruned = chunks_df.join(F.broadcast(parts), "part_id")
    key = doc_id.encode("utf-8")

    def task(batches):
        import numpy as np
        import pyarrow as pa

        from .. import chunk as chunkmod
        from ..kernels import ba

        batch_list = list(batches)
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list)
        pids = tbl.column("part_id").to_numpy(zero_copy_only=False)
        cols = tbl.column("col").to_pylist()
        blob_chunked = tbl.column("blob")
        blob_col = (blob_chunked.chunk(0)
                    if blob_chunked.num_chunks == 1
                    and blob_chunked.chunk(0).offset == 0
                    else blob_chunked.combine_chunks())
        by_part: dict[int, dict] = {}
        for i, (pid, c) in enumerate(zip(pids.tolist(), cols)):
            by_part.setdefault(pid, {})[c] = \
                memoryview(blob_col[i].as_buffer())
        for pid, blobs in sorted(by_part.items()):
            rows = _find_rows(blobs["doc_id"], key)
            if not rows:
                continue
            toks, n_toks, sources = [], [], []
            for r in rows:
                t = chunkmod.decode_chunk_rows(blobs["tokens"], r, r + 1)
                toks.append(np.asarray(t.values, dtype=np.int32))
                n = chunkmod.decode_chunk_rows(blobs["n_tok"], r, r + 1)
                n_toks.append(int(np.asarray(n.values)[0]))
                s = chunkmod.decode_chunk_rows(blobs["source"], r, r + 1)
                sources.append(s.values[0].decode("utf-8"))
            yield pa.RecordBatch.from_arrays([
                pa.array([pid] * len(rows), type=pa.int64()),
                pa.array([doc_id] * len(rows), type=pa.string()),
                pa.array([t.tolist() for t in toks],
                         type=pa.list_(pa.int32())),
                pa.array(n_toks, type=pa.int32()),
                pa.array(sources, type=pa.string()),
            ], names=["part_id", "doc_id", "tokens", "n_tok", "source"])

    return pruned.mapInArrow(task, DECODED_SCHEMA)


def _delete_leaf_path(path: str) -> str:
    """The single leaf column of an equality-delete key file (stored
    name — key files are one-column by construction)."""
    from ..sources import parquet_format as pf
    with open(path, "rb") as fh:
        meta = pf.read_footer(memoryview(fh.read()))
    return meta.leaves[0].name


def point_lookup_parquet(spark, dataset_dir: str, column: str, key):
    """Distributed point lookup over an ENGINE-WRITTEN parquet dataset
    (sources.parquet_sink output): tasks receive file paths, prune data
    pages through each file's PageIndex (ColumnIndex min/max — zero page
    headers touched for non-matching ranges), and decode only surviving
    pages. Returns (file, row_index, pages_decoded, pages_total) — the
    audit columns make the pruning observable, the same no-silent-work
    contract as the chunk-format point_lookup above.

    At 100 TB: file-level pruning comes free from the manifest/footer
    min-max (Catalyst does it for real predicates); this adds the
    page-level skip WITHIN each surviving file — reference
    TypedColumnReader::Skip (column_reader.h:268-281) on the interchange
    format."""
    import glob
    import os

    from ..shipping import ensure_shipped
    ensure_shipped(spark)

    schema = ("file string, row_index bigint, pages_decoded int, "
              "pages_total int")
    if not os.path.isdir(dataset_dir):
        raise FileNotFoundError(f"not a dataset dir: {dataset_dir}")
    if os.path.isdir(os.path.join(dataset_dir, "_snapshots")):
        # snapshot-logged dataset: look up against the committed cut —
        # uncommitted/pre-compaction files are invisible, and a key on
        # the kill list resolves to NO rows (merge-on-read applies to
        # point lookups too; one stats/bloom-pruned pass over the tiny
        # key files decides membership before any data file is touched)
        from ..sources import snapshots as snap
        doc = snap.load_snapshot(dataset_dir)
        snap_renames = doc.get("renames", {})
        # kill-list consultation happens in the CURRENT-name namespace:
        # the caller names the current column, and a delete entry's column
        # canonicalizes via the rename map exactly as _apply_deletes does
        # (entries committed pre-rename carry a stored name the map sends
        # to its current name; post-rename entries already carry the
        # current name, which by the no-reintroduction rule never collides
        # with a renamed-away stored name). Deletes keyed on a DIFFERENT
        # column are not applied here: this lookup answers "which physical
        # rows carry this key", and filtering them would require reading
        # the other delete column at each hit — read_snapshot /
        # read_parquet_dataset are the logical-row-set readers.
        for e in doc.get("deletes", []):
            if snap_renames.get(e["column"], e["column"]) != column:
                continue
            from ..sources import parquet_format as pf
            rows, _d, _t = pf.lookup_rows(
                os.path.join(dataset_dir, e["path"]),
                _delete_leaf_path(os.path.join(dataset_dir, e["path"])),
                key)
            if rows:
                return spark.createDataFrame([], schema)
        # data-file scan: a file stores the current name (appended after
        # the rename) or ANY stored chain member mapping to it — resolve
        # per file by trying each candidate, like record_assembly's
        # per-file remap
        lookup_names = [column] + sorted(
            k for k, v in snap_renames.items() if v == column)
        files = sorted(os.path.join(dataset_dir, e["path"])
                       for e in doc["files"])
    else:
        lookup_names = [column]
        # recursive: partitioned layouts (col=value/ subdirectories) keep
        # their files below the root; dotfiles are in-flight temps and
        # _/.-prefixed dirs are metadata, not data
        files = sorted(
            f for f in glob.glob(
                os.path.join(dataset_dir, "**", "*.parquet"),
                recursive=True)
            if not any(seg.startswith((".", "_")) for seg in
                       os.path.relpath(f, dataset_dir).split(os.sep)))
    if not files:
        # dir exists but holds no committed files (sink not yet run, or
        # only .inprogress temps): an empty result, not a crash
        return spark.createDataFrame([], schema)
    files_df = spark.createDataFrame([(f,) for f in files],
                                     "file string") \
        .repartition(min(len(files), spark.sparkContext.defaultParallelism))

    def task(batches):
        import pyarrow as pa

        from ..sources import parquet_format as pf

        def lookup_any(fpath):
            last = None
            for name in lookup_names:
                try:
                    return pf.lookup_rows(fpath, name, key)
                except ValueError as exc:
                    if "no leaf column" not in str(exc):
                        raise
                    last = exc
            raise last  # none of the chain's names exists: truly unknown

        for batch in batches:
            for fpath in batch.column("file").to_pylist():
                rows, dec, tot = lookup_any(fpath)
                yield pa.RecordBatch.from_arrays([
                    pa.array([fpath] * max(len(rows), 1), pa.string()),
                    pa.array(rows or [-1], pa.int64()),
                    pa.array([dec] * max(len(rows), 1), pa.int32()),
                    pa.array([tot] * max(len(rows), 1), pa.int32()),
                ], names=["file", "row_index", "pages_decoded",
                          "pages_total"])

    return files_df.mapInArrow(task, schema)
