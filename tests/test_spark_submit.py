"""Contract check (BASELINE.json north_star): the engine must run via
``spark-submit --py-files`` — i.e. the crawlspark package works when shipped
as a zip to a driver/executors that do NOT have the repo on PYTHONPATH.

Opt-in (SPARK_GRAFT_RUN_SUBMIT_TEST=1): the test spawns a second JVM, which
would slow every suite run; `jobs/submit_demo.sh` is the same invocation as
a standalone script. Verified green in this sandbox (BASELINE.md round 3)."""

import json
import os
import shutil
import subprocess
import sys
import tempfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_RUN_SUBMIT_TEST") != "1",
    reason="spawns a second JVM; run with SPARK_GRAFT_RUN_SUBMIT_TEST=1",
)
def test_spark_submit_pyfiles_crawl():
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    if not os.path.exists(spark_submit):
        pytest.skip("spark-submit not on this machine")
    tmp = tempfile.mkdtemp(prefix="submit-test-")
    zip_path = os.path.join(tmp, "crawlspark.zip")
    subprocess.run(
        [sys.executable, "-m", "zipfile", "-c", zip_path,
         os.path.join(REPO, "crawlspark")],
        check=True,
    )
    try:
        out = subprocess.run(
            [
                spark_submit, "--master", "local[8]",
                "--py-files", zip_path,
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                os.path.join(REPO, "jobs", "run_crawl.py"),
                "--root", os.path.join(tmp, "root"),
                "--seed-count", "40", "--web-hosts", "12",
                "--max-depth", "2", "--max-rounds", "8",
                "--shuffle-partitions", "8",
            ],
            capture_output=True, text=True, timeout=280,
            cwd=tmp,  # deliberately NOT the repo: only the zip provides the pkg
        )
        assert out.returncode == 0, out.stderr[-2000:]
        summary = json.loads(out.stdout.strip().splitlines()[-1])
        assert summary["rounds"] == 8
        assert summary["totals"]["fetched"] > 0
        assert summary["totals"]["seen"] >= summary["totals"]["fetched"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
