"""Parquet field_id emission (SchemaElement field 9): the id
Iceberg-family table formats track columns by across renames. Emitted on
top-level schema elements when requested; read back by pyarrow (as the
``PARQUET:field_id`` field metadata), by the engine's own footer parser,
and ignored harmlessly by Spark.

Reference parity: SchemaElement.field_id in the public parquet-format
thrift (the reference's ``parquet.thrift``); the writer's compact-thrift
field ordering contract.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _write(tmp_path, field_ids):
    from parquet_cpp_spark.sources import parquet_writer as pw
    path = str(tmp_path / "t.parquet")
    cols = [
        ("doc_id", "byte_array", [f"d{i}".encode() for i in range(10)]),
        pw.ListColumn("tokens", "int32",
                      list(range(30)), [3] * 10, use_dictionary=False),
        ("n_tok", "int32", list(range(10))),
    ]
    pw.write_file(path, cols, 10, utf8_columns={"doc_id"},
                  field_ids=field_ids)
    return path


def test_field_ids_roundtrip_three_readers(tmp_path):
    import pyarrow.parquet as pq

    from parquet_cpp_spark.sources import parquet_format as pf

    ids = {"doc_id": 1, "tokens": 2, "n_tok": 3}
    path = _write(tmp_path, ids)
    # engine's own parser
    meta = pf.read_footer(memoryview(open(path, "rb").read()))
    assert pf.top_level_field_ids(meta) == ids
    # pyarrow surfaces it as field metadata
    sch = pq.read_schema(path)
    got = {f.name: int(f.metadata[b"PARQUET:field_id"])
           for f in sch if f.metadata
           and b"PARQUET:field_id" in f.metadata}
    assert got == ids
    # data still reads
    assert pq.read_table(path).num_rows == 10


def test_partial_ids_and_absent_default(tmp_path):
    from parquet_cpp_spark.sources import parquet_format as pf
    from parquet_cpp_spark.sources import parquet_writer as pw

    path = _write(tmp_path, {"doc_id": 7})
    meta = pf.read_footer(memoryview(open(path, "rb").read()))
    assert pf.top_level_field_ids(meta) == {"doc_id": 7}
    # no ids requested -> empty map
    p3 = str(tmp_path / "noids.parquet")
    pw.write_file(p3, [("x", "int32", [1, 2, 3])], 3)
    meta3 = pf.read_footer(memoryview(open(p3, "rb").read()))
    assert pf.top_level_field_ids(meta3) == {}


def test_unknown_column_fails_loudly(tmp_path):
    from parquet_cpp_spark.sources import parquet_writer as pw

    with pytest.raises(ValueError, match="absent columns"):
        pw.write_file(str(tmp_path / "bad.parquet"),
                      [("x", "int32", [1])], 1, field_ids={"nope": 1})


def test_sink_passthrough_and_spark_read(tmp_path):
    from pyspark.sql import SparkSession

    import pyarrow.parquet as pq

    from parquet_cpp_spark.session import get_spark
    from parquet_cpp_spark.sources.parquet_sink import emit_parquet_dataset

    spark = get_spark(master="local[4]", app_name="pcs-field-ids",
                      shuffle_partitions=4)
    df = spark.range(0, 20).selectExpr(
        "cast(id as string) doc_id", "array(cast(id as int)) tokens",
        "cast(1 as int) n_tok", "cast('s' as string) source")
    out = str(tmp_path / "ds")
    man = emit_parquet_dataset(
        df.coalesce(2), out,
        field_ids={"doc_id": 1, "tokens": 2, "n_tok": 3,
                   "source": 4}).collect()
    for r in man:
        sch = pq.read_schema(r.file)
        assert int(sch.field("tokens").metadata[b"PARQUET:field_id"]) == 2
    assert spark.read.parquet(out).count() == 20
