"""spark-submit --py-files packaging test (north_rule: the job ships as a
zip via spark-submit, not as an installed package)."""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_zip(path: str) -> None:
    with zipfile.ZipFile(path, "w") as z:
        for root, _dirs, files in os.walk(os.path.join(REPO, "fa_spark")):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))


def test_spark_submit_py_files(tmp_path, pages_path):
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        import pyspark

        spark_submit = os.path.join(pyspark.__path__[0], "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit not found"

    zip_path = str(tmp_path / "fa_spark.zip")
    _make_zip(zip_path)
    out_dir = str(tmp_path / "out")
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.local.dir=/dev/shm/spark-local",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "extract_job.py"),
            "--input", pages_path,
            "--output", out_dir,
            "--run-id", "submit-test",
            "--committed-at", "2025-06-01T00:00:00+00:00",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # NOT the repo root — forces import from the zip
    )
    assert res.returncode == 0, res.stderr[-3000:]
    payload = json.loads(res.stdout.strip().splitlines()[-1])
    assert payload["analyses"] > 0
    assert os.path.isdir(os.path.join(out_dir, "analysis"))
    assert os.path.isdir(os.path.join(out_dir, "_lineage"))


def test_spark_submit_cli_corpus(tmp_path, pages_path):
    """The operator CLI end-to-end under spark-submit --py-files: corpus
    build with glob + language + quality flags, report on stdout."""
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    if not os.path.exists(spark_submit):
        import pyspark

        spark_submit = os.path.join(pyspark.__path__[0], "bin", "spark-submit")
    assert os.path.exists(spark_submit), "spark-submit not found"

    zip_path = str(tmp_path / "fa_spark.zip")
    _make_zip(zip_path)
    out_dir = str(tmp_path / "corpus")
    env = dict(os.environ, SPARK_LOCAL_IP="127.0.0.1")
    res = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.local.dir=/dev/shm/spark-local",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "cli_job.py"),
            "corpus",
            "--input", pages_path,
            "--output", out_dir,
            "--langs", "en,und",
            "--min-words", "10",
            "--exclude", "*host0.example*",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # NOT the repo root — forces import from the zip
    )
    assert res.returncode == 0, res.stderr[-3000:]
    payload = json.loads(res.stdout.strip().splitlines()[-1])
    assert payload["n_input"] > 0 and payload["n_corpus"] > 0
    assert os.path.isdir(out_dir)
