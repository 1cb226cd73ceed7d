"""Real CLI run of jobs/extract_job.py (the spark-submit surface), with
the S8 export flags — own JVM via subprocess, tiny corpus."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import zipfile

import pytest

from ocrd_odem_spark import gen
from ocrd_odem_spark.schema import DOCS_SCHEMA

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_extract_job_cli_with_export(spark, tmp_path):
    corpus = gen.make_corpus(11, 12)
    spark.createDataFrame(corpus, DOCS_SCHEMA).coalesce(1).write.parquet(
        str(tmp_path / "in")
    )
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    env["PYSPARK_SUBMIT_ARGS"] = "--master local[2] pyspark-shell"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "extract_job.py"),
         "--input", str(tmp_path / "in"),
         "--output", str(tmp_path / "out"),
         "--state", str(tmp_path / "state"),
         "--dehyphenate", "--buckets", "4",
         "--export-dir", str(tmp_path / "share"),
         "--export-format", "saf",
         "--export-prefix", "odem_",
         "--export-collection", "123456789/11"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["published"] == 4
    assert report["exported"] == len(corpus)
    zips = sorted(os.listdir(tmp_path / "share"))
    assert len(zips) == len(corpus)
    assert all(z.startswith("odem_") and z.endswith(".zip") for z in zips)
    with zipfile.ZipFile(tmp_path / "share" / zips[0]) as zf:
        names = set(zf.namelist())
    assert "dublin_core.xml" in names and "collections" in names
