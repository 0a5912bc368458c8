"""End-to-end spark-submit --py-files test (the north-rule deploy path).

Runs scripts/submit_crawl.py through a REAL `spark-submit` subprocess
with the package shipped ONLY via --py-files (cwd is a temp dir, so
the import cannot fall back to the repo checkout) — proving the same
artifact a multi-executor cluster would receive works end-to-end:
seed -> rounds -> checkpoint commits -> crawled/lineage parquet.
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPARK_SUBMIT = (
    shutil.which("spark-submit")
    or os.path.join(os.environ.get("SPARK_HOME", "/opt/spark"), "bin", "spark-submit")
)


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH")
def test_spark_submit_pyfiles_crawl(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles

    zip_path = make_pyfiles.build(str(tmp_path / "cloud_crawler_spark.zip"))
    out_dir = str(tmp_path / "out")

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # imports must come from --py-files
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.driver.memory=4g",
            "--py-files", zip_path,
            os.path.join(REPO, "scripts", "submit_crawl.py"),
            "--synth", "2000",
            "--out", out_dir,
            "--depth", "1",
            "--host-budget", "200",
            "--discard-page",
        ],
        cwd=str(tmp_path),  # NOT the repo: the zip is the only package source
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # last stdout line is the metrics JSON
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, proc.stdout[-2000:]
    metrics = json.loads(lines[-1])
    assert metrics["urls"] > 0
    assert metrics["rounds"] >= 1
    # outputs + resumable checkpoint landed
    assert os.path.isdir(os.path.join(out_dir, "crawled"))
    assert os.path.isdir(os.path.join(out_dir, "lineage"))
    assert os.path.isdir(os.path.join(out_dir, "checkpoint"))


@pytest.mark.skipif(not os.path.exists(SPARK_SUBMIT), reason="spark-submit not on PATH")
def test_spark_submit_multi_executor_matches_single_jvm(tmp_path):
    """TRUE multi-executor run: local-cluster[2,2,2048] launches two
    SEPARATE executor JVMs (real serialization, netty shuffle,
    broadcast to remote executors, per-executor python workers — the
    failure modes local[N] can't surface), fed ONLY by the --py-files
    zip. The crawl must produce the SAME url count and round count as
    the single-JVM run on the same deterministic input — the
    same-input-same-crawl guarantee is topology-independent, which is
    what lets the N vs 4N executor contrast of the north rule compare
    like with like."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import make_pyfiles

    zip_path = make_pyfiles.build(str(tmp_path / "cloud_crawler_spark.zip"))

    def run(master: str, out_name: str) -> dict:
        out_dir = str(tmp_path / out_name)
        env = dict(os.environ)
        env.pop("PYTHONPATH", None)  # imports must come from --py-files
        env.setdefault("PYSPARK_PYTHON", sys.executable)
        proc = subprocess.run(
            [
                SPARK_SUBMIT,
                "--master", master,
                "--conf", "spark.sql.shuffle.partitions=8",
                "--conf", "spark.ui.enabled=false",
                "--conf", "spark.driver.memory=3g",
                "--py-files", zip_path,
                os.path.join(REPO, "scripts", "submit_crawl.py"),
                "--synth", "1500",
                "--out", out_dir,
                "--depth", "1",
                "--host-budget", "200",
                "--discard-page",
            ],
            cwd=str(tmp_path),
            env=env,
            capture_output=True,
            text=True,
            timeout=600,
        )
        assert proc.returncode == 0, (master, proc.stderr[-4000:])
        lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
        assert lines, (master, proc.stdout[-2000:])
        return json.loads(lines[-1])

    single = run("local[4]", "out_single")
    multi = run("local-cluster[2,2,2048]", "out_multi")
    assert multi["urls"] == single["urls"] > 0
    assert multi["rounds"] == single["rounds"] >= 1
