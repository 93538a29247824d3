"""Direct-parquet encode source: Spark parallelizes over row-group
descriptors; each task pyarrow-reads its own row group and encodes it.

Rationale: the default scan path decodes parquet in the JVM, serializes the
decoded rows over Arrow IPC to the Python worker, which re-materializes them
— on a memory-bandwidth-bound host that doubles the traffic of the entire
job for no benefit, because the encode kernels live in Python anyway. Here
the JVM only shuffles tiny (path, row_group) descriptor rows; the token
payload is read once, in the worker, straight from the (page-cached) parquet
file. This is the same division of labor as the reference's
column-chunk-granular reads (``/root/reference/src/parquet/file_reader.cc:63-135``)
and is exactly how a custom DataSource scan partitions work.

part_id = sha256(file, row_group) — stable across reruns, so the resume
manifest's anti-join works over this source too.
"""

from __future__ import annotations

import os

from ..operators.encode import CHUNK_SCHEMA


def list_row_groups(path: str) -> list[tuple[str, int]]:
    """(file, row_group_index) descriptors for a parquet file or directory."""
    import pyarrow.parquet as pq

    files = []
    if os.path.isdir(path):
        for root, _dirs, names in os.walk(path):
            files.extend(os.path.join(root, f) for f in sorted(names)
                         if f.endswith(".parquet"))
    else:
        files = [path]
    out: list[tuple[str, int]] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        out.extend((f, i) for i in range(md.num_row_groups))
    return out


# Python tasks are not free: each mapInArrow task costs ~8-15 ms of
# JVM<->worker round-trip on this host (measured: a 128-task descriptor
# no-op runs 1.9-2.6 s at local[32] while the identical JVM-only job runs
# 0.19 s), and task launch is largely serialized. Slices therefore AMORTIZE:
# a slice should carry at least this many input units before extra slices
# (beyond one per core) pay for themselves. Scale-adaptive, not a local[32]
# constant: with many units per core (a real cluster's file counts) the cap
# `slices_per_core` wins and keeps fine-grained balance/straggler recovery.
MIN_UNITS_PER_SLICE = 8


def plan_slices(n_units: int, cores: int, slices_per_core: int) -> int:
    """Slice count for ``n_units`` work units: amortize python-task
    dispatch, but never below TWO waves per core (floor 2*cores when units
    allow) — the slice count is also the partition count a downstream
    ``.write`` materializes, so over-coarsening starves consumers of file
    parallelism (measured: 32 chunk files instead of 128 pushed the decode
    leg from ~4 to 7-11 s) and leaves single-wave straggler exposure."""
    amortized = max(n_units // MIN_UNITS_PER_SLICE, 2 * cores)
    return max(1, min(n_units, cores * slices_per_core, amortized))


def encode_parquet_direct(spark, path: str,
                          columns: dict[str, str] | None = None,
                          codec_overrides: dict[str, str] | None = None,
                          dict_size_limit: int = 1 << 20,
                          slices_per_core: int = 4,
                          props: "object | None" = None):
    """Encode a parquet token table without moving row data through the JVM.

    Returns the chunk DataFrame (same schema as operators.encode)."""
    from ..shipping import ensure_shipped
    ensure_shipped(spark)

    from ..operators.encode_arrow import make_arrow_encode_fn

    splits = list_row_groups(path)
    cores = spark.sparkContext.defaultParallelism
    n_parts = plan_slices(len(splits), cores, slices_per_core)
    # parallelize with explicit slice count instead of repartition: no
    # shuffle stage (one less stage barrier per job), and contiguous row
    # groups stay on one task — better page-cache locality. Chunk contents
    # are identical either way (one chunk set per row group).
    splits_df = spark.createDataFrame(
        spark.sparkContext.parallelize(splits, n_parts),
        "file string, rg int")

    encode_fn = make_arrow_encode_fn(columns, codec_overrides,
                                     dict_size_limit, props)

    def task(batches):
        import pyarrow.parquet as pq

        descs: list[tuple[str, int]] = []
        for batch in batches:
            descs.extend(zip(batch.column("file").to_pylist(),
                             batch.column("rg").to_pylist()))
        i = 0
        while i < len(descs):
            # one ParquetFile + one iter_batches stream per run of row
            # groups from the same file: reopening per row group re-parses
            # the full footer each time, and the streaming reader is ~12%
            # faster than per-row-group read_row_group calls — per-task
            # overhead the 1-core legs pay n_row_groups times over.
            # use_threads=False: one task = one core (letting pyarrow fan
            # out across the node's global pool makes tasks steal each
            # other's cores and low-parallelism benches lie).
            f = descs[i][0]
            j = i
            rgs: list[int] = []
            while j < len(descs) and descs[j][0] == f:
                rgs.append(descs[j][1])
                j += 1
            i = j
            pf = pq.ParquetFile(f, memory_map=True)
            md = pf.metadata
            sizes = [md.row_group(r).num_rows for r in rgs]
            rgs = [r for r, s in zip(rgs, sizes) if s]
            sizes = [s for s in sizes if s]
            if not rgs:
                continue
            # batch_size >= every selected row group's rows => the reader
            # yields EXACTLY one batch per row group (it never merges
            # across row-group boundaries), preserving the one-chunk-set-
            # per-row-group contract (stable content-derived part_ids)
            it = pf.iter_batches(batch_size=max(sizes), row_groups=rgs,
                                 use_threads=False)
            for want, b in zip(sizes, it):
                if len(b) != want:
                    raise RuntimeError(
                        f"row-group batch misalignment in {f!r}: got "
                        f"{len(b)} rows, expected {want}")
                yield from encode_fn([b])

    out = splits_df.mapInArrow(task, schema=CHUNK_SCHEMA)
    out._pcs_colocated = True  # one part's whole chunk set per task
    return out
