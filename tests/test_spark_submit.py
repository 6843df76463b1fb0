"""North-rule launch contract: the job must run via
``spark-submit --py-files <zip>`` as its own driver process (not just
importlib inside the test session).  One small end-to-end run:
synthesize pages -> extract -> KG tables -> JSON summary on stdout.
"""

import json
import os
import pathlib
import shutil
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _spark_submit() -> str:
    import pyspark

    cand = pathlib.Path(pyspark.__file__).parent / "bin" / "spark-submit"
    if cand.exists():
        return str(cand)
    found = shutil.which("spark-submit")
    if not found:
        pytest.skip("no spark-submit binary available")
    return found


@pytest.mark.slow
def test_spark_submit_py_files_end_to_end(tmp_path):
    subprocess.run([sys.executable, str(REPO / "tools" / "build_zip.py")],
                   check=True, cwd=REPO)
    zip_path = REPO / "dist" / "mdscraper_spark.zip"
    wh = tmp_path / "wh"
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"
    # run from an empty cwd so only --py-files provides the package
    proc = subprocess.run(
        [_spark_submit(), "--master", "local[4]",
         "--py-files", str(zip_path),
         str(REPO / "mdscraper_spark" / "jobs" / "extract.py"),
         "--synthesize", "120", "--warehouse", str(wh),
         "--n-buckets", "4", "--run-id", "submit-smoke"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]
    summary = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert summary["run_id"] == "submit-smoke"
    assert summary["tables"]["markdown_docs"] == 120
    assert summary["tables"]["kg_edges"] > 0
    assert (wh / "markdown_docs").exists()


@pytest.mark.slow
def test_spark_submit_kg_stream_lambda_loop(spark, tmp_path):
    """The standing-ingest job also launches as its own spark-submit
    driver: ingest + canonicalize + snapshot expiry in one invocation."""
    from mdscraper_spark.sources.pages import PAGES_SCHEMA, bulk_pages_df

    subprocess.run([sys.executable, str(REPO / "tools" / "build_zip.py")],
                   check=True, cwd=REPO)
    zip_path = REPO / "dist" / "mdscraper_spark.zip"
    inp = tmp_path / "pages_in"
    spark.createDataFrame(bulk_pages_df(spark, 40).collect(),
                          PAGES_SCHEMA).write.parquet(str(inp))
    env = dict(os.environ)
    env.pop("SPARK_GRAFT_MASTER", None)
    env["SPARK_GRAFT_CPUS"] = "4"
    env["SPARK_GRAFT_DRIVER_MEM"] = "2g"
    proc = subprocess.run(
        [_spark_submit(), "--master", "local[4]",
         "--py-files", str(zip_path),
         str(REPO / "mdscraper_spark" / "jobs" / "kg_stream.py"),
         "--input", str(inp), "--warehouse", str(tmp_path / "wh"),
         "--checkpoint", str(tmp_path / "ckpt"),
         "--ingest", "--canonicalize", "--expire-keep", "1"],
        cwd=tmp_path, env=env, capture_output=True, text=True, timeout=420)
    assert proc.returncode == 0, proc.stderr[-4000:]
    out = json.loads(
        [l for l in proc.stdout.splitlines() if l.startswith("{")][-1])
    assert out["ingested"] and out["n_edges"] > 0
    assert "raw_edges" in out["expired"]
    assert (tmp_path / "wh" / "kg_edges").exists()
