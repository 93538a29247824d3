"""The north rule's literal deployment mode: `spark-submit --py-files
parquet_cpp_spark.zip <job>` — the driver script imports the engine
ONLY from the shipped zip (repo not on sys.path, foreign CWD), runs a
real extraction job, and the output is a valid snapshot-committed
engine-parquet dataset."""
import glob
import json
import os
import shutil
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.mark.skipif(shutil.which("spark-submit") is None,
                    reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_deployment(tmp_path):
    import pyarrow.parquet as pq

    from parquet_cpp_spark.shipping import _package_zip
    from parquet_cpp_spark.sources.tokens import synthesize_tokens_parquet

    zip_path = _package_zip()
    srcdir = tmp_path / "src"
    srcdir.mkdir()
    synthesize_tokens_parquet(str(srcdir / "tok.parquet"), 400, 53,
                              row_group_size=200)
    out = str(tmp_path / "extract")
    script = tmp_path / "submit_job.py"
    script.write_text(
        "import sys\n"
        "from parquet_cpp_spark import jobs\n"   # resolves from the zip
        "jobs.main(sys.argv[1:])\n")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)                  # the zip is the ONLY source
    r = subprocess.run(
        ["spark-submit", "--py-files", zip_path, str(script),
         "--master", "local[2]", "scan", "--dir", str(srcdir),
         "--out", out, "--where", "n_tok>=10", "--snapshot"],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=420)
    assert r.returncode == 0, f"spark-submit failed:\n{r.stderr[-3000:]}"
    res = json.loads(r.stdout.strip().splitlines()[-1])
    assert res["snapshot_version"] == 1
    assert res["files"] >= 1 and res["rows"] >= 1

    # the output is a plain parquet dataset (pyarrow scans it with zero
    # engine code) whose row count matches the job's own report
    total = sum(pq.ParquetFile(f).metadata.num_rows
                for f in glob.glob(os.path.join(out, "*.parquet")))
    assert total == res["rows"]
    # and the snapshot log is in place with the same listing
    snap = json.load(open(os.path.join(
        out, "_snapshots", "v0000000001.json")))
    assert snap["total_rows"] == res["rows"]
    assert snap["total_files"] == res["files"]
