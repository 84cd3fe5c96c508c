"""Contract check (BASELINE.json north_star): the pipeline runs via
``spark-submit --py-files crawlspark.zip`` — the package ships as an archive
to a driver/executors whose working directory is NOT the repo, exactly as it
would on a multi-executor cluster. Also exercises the seeds-file source
(S1: `sources/seeds.load_seed_file`). `jobs/submit_demo.sh` is the same
invocation as a standalone script."""

from __future__ import annotations

import json
import shutil
import subprocess
import zipfile
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not Path(SPARK_SUBMIT).exists(), reason="spark-submit not on PATH"
)
def test_spark_submit_py_files(tmp_path):
    zip_path = tmp_path / "crawlspark.zip"
    with zipfile.ZipFile(zip_path, "w") as z:
        for f in (REPO / "crawlspark").rglob("*.py"):
            z.write(f, f.relative_to(REPO))
    seeds = tmp_path / "seeds.txt"
    seeds.write_text(
        "\n".join(f"http://host{i % 4:02d}.example/s{i}/start" for i in range(12))
    )
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.sql.adaptive.enabled=false",
            "--conf", "spark.ui.enabled=false",
            "--py-files", str(zip_path),
            str(REPO / "jobs" / "run_crawl.py"),
            "--root", str(tmp_path / "crawl"),
            "--seeds", str(seeds),
            "--max-depth", "1",
            "--max-rounds", "6",
            "--web-hosts", "4",
            "--shuffle-partitions", "4",
        ],
        capture_output=True,
        text=True,
        timeout=420,
        cwd=str(tmp_path),  # NOT the repo: the zip must supply the package
    )
    assert out.returncode == 0, out.stderr[-3000:]
    summary = json.loads(out.stdout.strip().splitlines()[-1])
    assert summary["totals"]["fetched"] > 0
    assert summary["totals"]["seen"] >= summary["totals"]["fetched"]
    assert (tmp_path / "crawl" / "_manifests").exists()
