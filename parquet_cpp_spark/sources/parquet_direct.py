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
    n_parts = min(len(splits), max(1, cores * slices_per_core))
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

        for batch in batches:
            files = batch.column("file").to_pylist()
            rgs = batch.column("rg").to_pylist()
            for f, rg in zip(files, rgs):
                # use_threads=False: one task = one core. Letting pyarrow
                # fan a row-group read across the node's global thread pool
                # makes tasks steal each other's cores (and makes low-
                # parallelism benchmarks lie about per-core throughput).
                tbl = pq.ParquetFile(f).read_row_group(rg,
                                                       use_threads=False)
                yield from encode_fn(tbl.to_batches())

    out = splits_df.mapInArrow(task, schema=CHUNK_SCHEMA)
    out._pcs_colocated = True  # one part's whole chunk set per task
    return out
