"""PAR1 writer interop: engine-write -> pyarrow/DuckDB/own-reader read.

The reference writes files other implementations read
(``/root/reference/src/parquet/file_writer.cc:270-280``); this is that
contract for the engine's writer — every value written with the engine's
own kernels must come back identically through pyarrow's independent C++
reader, DuckDB's independent reader, AND the engine's own golden-file
reader (sources.parquet_format)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_cpp_spark.sources import parquet_format, parquet_writer as pw


@pytest.fixture()
def alltypes(tmp_path):
    n = 2000
    rng = np.random.default_rng(11)
    valid = rng.random(n) > 0.25
    cols = {
        "i32": rng.integers(-10**6, 10**6, n).astype(np.int32),
        "i64": rng.integers(-10**15, 10**15, n),
        "f32": rng.standard_normal(n).astype(np.float32),
        "f64": rng.standard_normal(n),
        "ba": [f"doc-{i % 211}".encode() for i in range(n)],
        "ba_dict": [f"src{i % 13}".encode() for i in range(n)],
        "i32_opt": rng.integers(0, 500, n).astype(np.int32),
        "i32_opt_dict": rng.integers(0, 40, n).astype(np.int32),
        "flag": rng.random(n) > 0.5,
    }
    path = str(tmp_path / "alltypes.parquet")
    pw.write_file(path, [
        ("i32", "int32", cols["i32"]),
        ("i64", "int64", cols["i64"]),
        ("f32", "float", cols["f32"]),
        ("f64", "double", cols["f64"]),
        ("ba", "byte_array", cols["ba"]),
        ("ba_dict", "byte_array", cols["ba_dict"], None, True),
        ("i32_opt", "int32", cols["i32_opt"], valid),
        ("i32_opt_dict", "int32", cols["i32_opt_dict"], valid, True),
        ("flag", "boolean", cols["flag"]),
    ], n)
    return path, cols, valid, n


def test_pyarrow_reads_back_every_value(alltypes):
    import pyarrow.parquet as pq
    path, cols, valid, n = alltypes
    t = pq.read_table(path)
    assert t.num_rows == n
    assert t.column("i32").to_numpy().tolist() == cols["i32"].tolist()
    assert t.column("i64").to_numpy().tolist() == cols["i64"].tolist()
    assert t.column("f32").to_numpy().tolist() == cols["f32"].tolist()
    assert t.column("f64").to_numpy().tolist() == cols["f64"].tolist()
    assert t.column("ba").to_pylist() == cols["ba"]
    assert t.column("ba_dict").to_pylist() == cols["ba_dict"]
    exp_opt = [int(v) if ok else None
               for v, ok in zip(cols["i32_opt"], valid)]
    assert t.column("i32_opt").to_pylist() == exp_opt
    exp_optd = [int(v) if ok else None
                for v, ok in zip(cols["i32_opt_dict"], valid)]
    assert t.column("i32_opt_dict").to_pylist() == exp_optd
    assert t.column("flag").to_pylist() == cols["flag"].tolist()


def test_duckdb_reads_back(alltypes):
    import duckdb
    path, cols, valid, n = alltypes
    got = duckdb.sql(
        f"SELECT count(*), sum(i32), count(i32_opt), sum(i64) "
        f"FROM read_parquet('{path}')").fetchone()
    assert got[0] == n
    assert got[1] == int(cols["i32"].sum())
    assert got[2] == int(valid.sum())
    assert got[3] == int(cols["i64"].sum())


def test_own_reader_round_trip(alltypes):
    """Symmetry: the engine's golden-file READER decodes the engine's
    writer output (writer and reader share no code above the kernels)."""
    from parquet_cpp_spark.kernels import ba
    path, cols, valid, n = alltypes
    got = parquet_format.read_file(path)
    assert got["i32"][0].tolist() == cols["i32"].tolist()
    assert ba.to_list(got["ba_dict"][0]) == cols["ba_dict"]
    vals, deflev = got["i32_opt"]
    assert deflev.tolist() == valid.astype(int).tolist()
    assert vals.tolist() == cols["i32_opt"][valid].tolist()


def test_writer_rejects_out_of_scope(tmp_path):
    with pytest.raises(ValueError, match="writer supports"):
        pw.write_file(str(tmp_path / "x.parquet"),
                      [("a", "flba:12", [b"x" * 12])], 1)
    with pytest.raises(ValueError, match="slots, expected"):
        pw.write_file(str(tmp_path / "y.parquet"),
                      [("a", "int32", np.arange(3, dtype=np.int32))], 4)
