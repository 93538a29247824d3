"""Distributed PAR1 emission: executors write the engine's own parquet.

The write-side completion of the file-format story. ``parquet_writer``
proved the engine can emit a readable PAR1 file; this sink makes that a
first-class *distributed* output: every task writes its own row group's
worth of data as one engine-written parquet file directly into ``out_dir``
(atomic dot-prefixed temp + rename, the ``chunk_sink`` idempotency
contract), and only a manifest row — file, rows, values, bytes, checksum —
crosses to the JVM. The result directory is a plain parquet dataset that
``spark.read.parquet`` / DuckDB / pyarrow scan with zero engine code,
mirroring the reference's ``RowGroupSerializer``/``FileSerializer`` split
(``/root/reference/src/parquet/file_writer.cc:60-236``: per-row-group
column serialization under a shared file writer contract).

Scale shape (the 100-TB plan): the JVM ships only ``(file, row_group)``
descriptors to tasks; each task streams its row group through pyarrow,
encodes with the engine's kernels, and writes to shared storage itself —
the encoded payload never transits the JVM, and file names are
content+source tagged so task retries overwrite with identical bytes
instead of duplicating.

Column mapping is derived from the Arrow schema — flat
int32/int64/float/double/bool/string/binary leaves (nullable supported),
date32 / timestamp[ms|us] (stored as annotated ints), plus
``list<int32|int64>`` columns (REQUIRED lists via rep/def levels).
Anything else fails loudly. ``encodings='auto'`` applies the engine's
codec selector per column per file; ``resume=True`` rebuilds manifest
rows for already-committed files from their footer metadata instead of
re-encoding (checkpoint resume for the parquet output).
"""

from __future__ import annotations

import os

MANIFEST_SCHEMA = ("file string, n_rows bigint, n_values bigint, "
                   "bytes bigint, checksum string, encodings string")

_FLAT_PHYS = {"int32": "int32", "int64": "int64", "float": "float",
              "double": "double", "bool": "boolean"}


def specs_from_arrow(tbl):
    """Arrow table -> (specs, utf8 column names, temporal annotations).

    The bridge between ``mapInArrow`` batches and ``parquet_writer``:
    list columns become ``ListColumn`` (offsets -> lengths, flattened
    values), nullable flat columns carry their validity mask, strings get
    the UTF8 annotation, date32/timestamp columns store as annotated
    int32/int64 (DATE / TIMESTAMP_MILLIS / TIMESTAMP_MICROS converted
    types). Fails loudly on shapes the writer doesn't cover (nested
    lists, structs, maps, null list slots, ns/s timestamps)."""
    import numpy as np
    import pyarrow as pa

    from . import parquet_writer as pw

    specs, utf8, annotations = [], set(), {}
    for name in tbl.column_names:
        col = tbl.column(name).combine_chunks()
        if isinstance(col, pa.ChunkedArray):   # older pyarrow: 1-chunk CA
            col = col.chunk(0) if col.num_chunks \
                else pa.array([], type=col.type)
        typ = col.type
        if pa.types.is_date32(typ) or pa.types.is_timestamp(typ):
            if pa.types.is_date32(typ):
                phys, ann = "int32", "date"
                col = col.cast(pa.int32())
            else:
                unit = typ.unit
                if unit not in ("ms", "us"):
                    raise ValueError(f"column {name}: timestamp[{unit}] "
                                     "out of scope (ms/us only)")
                phys = "int64"
                # tz-aware arrow timestamps are UTC instants; tz-NAIVE
                # ones must stay NTZ — writing the legacy converted type
                # for those would silently turn wall-clock values into
                # UTC instants (readers shift them by session timezone)
                ann = f"timestamp_{unit}" if typ.tz is not None \
                    else f"timestamp_ntz_{unit}"
                col = col.cast(pa.timestamp(unit)).cast(pa.int64())
            annotations[name] = ann
            valid = None
            if col.null_count:
                valid = ~np.asarray(col.is_null())
                col = col.fill_null(0)
            specs.append((name, phys,
                          col.to_numpy(zero_copy_only=False), valid))
        elif pa.types.is_list(typ) or pa.types.is_large_list(typ):
            inner = str(typ.value_type)
            if inner not in ("int32", "int64"):
                raise ValueError(f"column {name}: list<{inner}> out of "
                                 "writer scope (int32/int64 elements only)")
            if col.null_count:
                raise ValueError(f"column {name}: NULL list slots are out "
                                 "of scope (REQUIRED lists only)")
            offsets = col.offsets.to_numpy(zero_copy_only=False)
            lengths = np.diff(offsets)
            values = col.flatten().to_numpy(zero_copy_only=False)
            specs.append(pw.ListColumn(name, inner, values, lengths,
                                       use_dictionary=True))
        elif pa.types.is_string(typ) or pa.types.is_large_string(typ) \
                or pa.types.is_binary(typ):
            if pa.types.is_string(typ) or pa.types.is_large_string(typ):
                utf8.add(name)
            valid = None
            if col.null_count:
                valid = ~np.asarray(col.is_null())
                vals = [v if v is not None else b""
                        for v in (x.as_py() for x in col)]
                vals = [v.encode() if isinstance(v, str) else v
                        for v in vals]
            else:
                vals = [v.encode() if isinstance(v, str) else v
                        for v in col.to_pylist()]
            specs.append((name, "byte_array", vals, valid, True))
        elif str(typ) in _FLAT_PHYS:
            valid = None
            if col.null_count:
                valid = ~np.asarray(col.is_null())
                col = col.fill_null(0)
            vals = col.to_numpy(zero_copy_only=False)
            specs.append((name, _FLAT_PHYS[str(typ)], vals, valid))
        else:
            raise ValueError(f"column {name}: arrow type {typ} out of "
                             "parquet_sink scope")
    return specs, utf8, annotations


def auto_encodings(specs) -> tuple:
    """Run the engine's codec auto-selector over extracted specs and map
    its per-chunk choice onto the parquet writer's encoding surface:
    RLE / RLE_DICTIONARY -> dictionary pages, DELTA_BINARY_PACKED ->
    delta pages, choices parquet 1.0 can't express (FSST,
    DELTA_*_BYTE_ARRAY) -> PLAIN (the dict fallback still guards
    accidental dictionary blowups). Returns (new_specs, delta_columns)
    — the same decision the chunk format makes, one per column per file,
    so each output file is independently optimal like each chunk is."""
    import numpy as np

    from .. import chunk as chunkmod, selector
    from . import parquet_writer as pw

    out, delta_cols = [], set()
    for s in specs:
        if isinstance(s, pw.ListColumn):
            codec = selector.select_int_codec(
                np.asarray(s.values), s.phys)
            if codec == chunkmod.DELTA_BINARY_PACKED:
                delta_cols.add(s.name)
            out.append(pw.ListColumn(
                s.name, s.phys, s.values, s.lengths,
                use_dictionary=codec in (chunkmod.RLE,
                                         chunkmod.RLE_DICTIONARY)))
            continue
        name, phys, vals = s[0], s[1], s[2]
        valid = s[3] if len(s) > 3 else None
        if phys in ("int32", "int64"):
            dense = np.asarray(vals) if valid is None \
                else np.asarray(vals)[np.asarray(valid)]
            codec = selector.select_int_codec(dense, phys)
            if codec == chunkmod.DELTA_BINARY_PACKED:
                delta_cols.add(name)
            use_dict = codec in (chunkmod.RLE, chunkmod.RLE_DICTIONARY)
        elif phys == "byte_array":
            dense = vals if valid is None \
                else [v for v, ok in zip(vals, valid) if ok]
            codec = selector.select_bytes_codec(dense)
            use_dict = codec == chunkmod.RLE_DICTIONARY
        else:
            out.append((name, phys, vals, valid))
            continue
        out.append((name, phys, vals, valid, use_dict))
    return out, frozenset(delta_cols)


def _encodings_tag(specs, delta_cols) -> str:
    """Human/manifest-readable per-column encoding summary."""
    from . import parquet_writer as pw
    parts = []
    for s in specs:
        if isinstance(s, pw.ListColumn):
            name, use_dict = s.name, s.use_dictionary
        else:
            name = s[0]
            use_dict = bool(s[4]) if len(s) > 4 else False
        enc = ("delta" if name in delta_cols
               else "dict" if use_dict else "plain")
        parts.append(f"{name}={enc}")
    return ",".join(parts)


def _attempt_tag() -> str:
    """Unique-per-task-attempt suffix for temp names: two attempts of the
    same task (speculation, zombie executors on shared storage) must NEVER
    share a temp file — interleaved writes would commit a corrupt file
    whose checksum still 'matches' (it hashes the corrupt bytes)."""
    from pyspark import TaskContext
    ctx = TaskContext.get()
    if ctx is None:
        import os as _os
        return f"drv{_os.getpid()}"
    return f"a{ctx.taskAttemptId()}"


def _manifest_batch(row):
    """One manifest tuple -> a single-row Arrow batch (MANIFEST_SCHEMA)."""
    import pyarrow as pa
    return pa.RecordBatch.from_arrays(
        [pa.array([row[0]], pa.string()),
         pa.array([row[1]], pa.int64()),
         pa.array([row[2]], pa.int64()),
         pa.array([row[3]], pa.int64()),
         pa.array([row[4]], pa.string()),
         pa.array([row[5]], pa.string())],
        names=["file", "n_rows", "n_values", "bytes", "checksum",
               "encodings"])


def _write_one_file(tbl, tmp: str, dest: str, row_group_rows, page_rows,
                    compression, delta_columns, encodings,
                    data_page_version):
    """Write one Arrow table as one engine PAR1 file (dot-prefixed temp +
    atomic rename) and return its manifest tuple."""
    import hashlib

    import numpy as np

    from . import parquet_writer as pw
    specs, utf8, annotations = specs_from_arrow(tbl)
    d_cols = frozenset(delta_columns)
    if encodings == "auto":
        specs, d_cols = auto_encodings(specs)
    n_values = sum(
        int(np.asarray(s.lengths).sum())
        if hasattr(s, "lengths") and s.lengths is not None
        else tbl.num_rows
        for s in specs)
    enc_tag = _encodings_tag(specs, d_cols)
    # manifest fields ride in the footer's key_value_metadata so a
    # resumed job can rebuild its manifest row WITHOUT re-encoding;
    # pcs.params records the writer knobs so resume can detect a rerun
    # with DIFFERENT parameters and re-encode instead of trusting stale
    # files
    params = _params_tag(row_group_rows, page_rows, compression,
                         delta_columns, encodings, data_page_version)
    pw.write_file(tmp, specs, tbl.num_rows,
                  row_group_rows=row_group_rows, page_rows=page_rows,
                  compression=compression, utf8_columns=utf8,
                  delta_columns=d_cols,
                  data_page_version=data_page_version,
                  annotations=annotations,
                  key_value_metadata={"pcs.n_values": str(n_values),
                                      "pcs.encodings": enc_tag,
                                      "pcs.params": params})
    with open(tmp, "rb") as fh:
        data = fh.read()
    sha = hashlib.sha256(data).hexdigest()
    dest = dest.format(sha=sha[:16])
    os.replace(tmp, dest)  # atomic; retries overwrite
    return (dest, tbl.num_rows, n_values, len(data), sha, enc_tag)


def _params_tag(row_group_rows, page_rows, compression, delta_columns,
                encodings, data_page_version) -> str:
    return (f"rg={row_group_rows};pg={page_rows};c={compression};"
            f"d={','.join(sorted(delta_columns))};e={encodings};"
            f"v={data_page_version}")


def _manifest_from_existing(dest: str, expected_params: "str | None" = None):
    """Manifest tuple for an already-committed engine file (resume path):
    n_rows from the footer, n_values/encodings from the embedded
    key_value_metadata, checksum re-hashed from the bytes on disk.
    Returns None when the file is absent, truncated, or not ours —
    the caller then re-encodes."""
    import hashlib

    from . import parquet_format as pf
    try:
        with open(dest, "rb") as fh:
            data = fh.read()
        if len(data) < 12 or data[:4] != b"PAR1" or data[-4:] != b"PAR1":
            return None
        meta = pf.read_footer(memoryview(data))
        kv = meta.key_value_metadata
        if "pcs.n_values" not in kv:
            return None
        if expected_params is not None and \
                kv.get("pcs.params") != expected_params:
            return None   # written with different knobs: re-encode
        return (dest, meta.num_rows, int(kv["pcs.n_values"]), len(data),
                hashlib.sha256(data).hexdigest(), kv["pcs.encodings"])
    except Exception:
        return None


def emit_parquet_dataset(df, out_dir: str,
                         name_prefix: str = "",
                         row_group_rows: "int | None" = None,
                         page_rows: "int | None" = 2048,
                         compression: "str | None" = "zstd",
                         delta_columns: "frozenset | set" = frozenset(),
                         encodings: str = "default",
                         data_page_version: int = 1):
    """DataFrame-in variant of ``write_parquet_dataset``: each task writes
    its partition's rows as ONE engine-format parquet file named by its
    CONTENT hash (``{prefix}part-{sha16}.parquet``) — a retried task that
    reproduces the same partition content overwrites the same file with
    identical bytes. Content-hash naming alone does NOT make retries
    idempotent: callers must make partition content deterministic —
    hash-partition AND sort within partitions (shuffle fetch order is
    nondeterministic; the streaming sink does both) — or a retried task
    can emit the same rows in a different order under a different name,
    duplicating data. Returns the manifest DataFrame (lazy: files are
    written when the manifest is consumed)."""
    from ..shipping import ensure_shipped
    ensure_shipped(df.sparkSession)
    os.makedirs(out_dir, exist_ok=True)

    def task(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        batch_list = [b for b in batches if b.num_rows]
        if not batch_list:
            return
        tbl = pa.Table.from_batches(batch_list)
        pid = TaskContext.get().partitionId()
        tmp = os.path.join(
            out_dir, f".emit-{name_prefix}{pid}-{_attempt_tag()}.inprogress")
        dest = os.path.join(out_dir,
                            name_prefix + "part-{sha}.parquet")
        row = _write_one_file(tbl, tmp, dest, row_group_rows, page_rows,
                              compression, delta_columns, encodings,
                              data_page_version)
        yield _manifest_batch(row)

    return df.mapInArrow(task, MANIFEST_SCHEMA)


def write_parquet_dataset(spark, src_path: str, out_dir: str,
                          row_group_rows: "int | None" = None,
                          page_rows: "int | None" = 2048,
                          compression: "str | None" = "zstd",
                          delta_columns: "frozenset | set" = frozenset(),
                          encodings: str = "default",
                          data_page_version: int = 1,
                          resume: bool = False,
                          slices_per_core: int = 4):
    """Encode ``src_path`` (parquet file/dir) into a directory of
    ENGINE-written PAR1 files, one per source row group, written by the
    executors themselves. Returns the manifest DataFrame
    (``MANIFEST_SCHEMA``); the output dir is a normal parquet dataset.

    Atomicity/idempotency: tasks write ``.name.inprogress`` (dot-prefixed,
    so a concurrent ``spark.read.parquet(out_dir)`` ignores partial
    files) then ``os.replace`` — a retried task overwrites with identical
    bytes. The manifest checksum is the sha256 of the final file.

    ``encodings='auto'`` runs the engine's codec auto-selector per column
    per file (mapped onto parquet's encoding surface via
    ``auto_encodings``) instead of the defaults (dict for strings/lists,
    plus explicit ``delta_columns``); the manifest's ``encodings`` column
    records each file's choices.

    ``resume=True`` is the checkpoint-resume mode (the manifest
    anti-join's analog for the parquet output): a split whose destination
    file already exists with valid PAR1 magic and the engine's embedded
    footer metadata is SKIPPED — its manifest row is rebuilt from the
    footer (``pcs.n_values`` / ``pcs.encodings`` key_value_metadata) and
    a re-hash of the bytes on disk, no re-encode. Names are source-tagged
    per (file, row_group), so resume trusts that the SOURCE split is
    unchanged; truncated or foreign files re-encode."""
    from ..shipping import ensure_shipped
    from .parquet_direct import list_row_groups
    ensure_shipped(spark)

    os.makedirs(out_dir, exist_ok=True)
    splits = list_row_groups(src_path)
    cores = spark.sparkContext.defaultParallelism
    n_parts = max(1, min(len(splits), cores * slices_per_core))
    splits_df = spark.createDataFrame(
        spark.sparkContext.parallelize(splits, n_parts),
        "file string, rg int")
    delta_cols = frozenset(delta_columns)

    def task(batches):
        import hashlib

        import pyarrow as pa
        import pyarrow.parquet as pq

        for batch in batches:
            for f, rg in zip(batch.column("file").to_pylist(),
                             batch.column("rg").to_pylist()):
                # name carries the SOURCE tag (file, rg): a retried split
                # overwrites its own file, two distinct splits never share
                tag = hashlib.sha256(f"{f}#{rg}".encode()).hexdigest()[:16]
                dest = os.path.join(out_dir, f"part-{tag}.parquet")
                if resume:
                    # BEFORE reading the source: a resumed split costs one
                    # footer parse + hash, zero source I/O, zero encode;
                    # a file written under different writer knobs fails
                    # the pcs.params check and re-encodes
                    row = _manifest_from_existing(
                        dest, _params_tag(row_group_rows, page_rows,
                                          compression, delta_cols,
                                          encodings, data_page_version))
                    if row is not None:
                        yield _manifest_batch(row)
                        continue
                tbl = pq.ParquetFile(f).read_row_group(rg, use_threads=False)
                row = _write_one_file(
                    tbl,
                    os.path.join(
                        out_dir,
                        f".part-{tag}-{_attempt_tag()}.inprogress"),
                    dest,
                    row_group_rows, page_rows, compression, delta_cols,
                    encodings, data_page_version)
                yield _manifest_batch(row)

    return splits_df.mapInArrow(task, schema=MANIFEST_SCHEMA)
