"""Real CLI run of jobs/dedup_job.py (the spark-submit surface) — own
JVM via subprocess: LSH -> Jaccard verify -> components -> canonical
election over a corpus with known duplicate structure."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _text(seed: int, n_tokens: int = 60) -> str:
    # large token space so distinct seeds share ~no shingles (a small
    # modulus makes every text an overlapping progression -> all near-dups)
    return " ".join(
        f"w{(seed * 2654435761 + i * 40503) % 99991}" for i in range(n_tokens)
    )


@pytest.mark.slow
def test_dedup_job_cli(spark, tmp_path):
    # 3 clones of text A, 2 clones of text B, one near-dup pair (one token
    # changed in 60), 10 unique docs -> 4 expected duplicates
    a, b = _text(1), _text(2)
    near = _text(3)
    near_edit = "CHANGED " + near.split(" ", 1)[1]
    rows = (
        [(f"a{i}", a) for i in range(3)]
        + [(f"b{i}", b) for i in range(2)]
        + [("n0", near), ("n1", near_edit)]
        + [(f"u{i}", _text(100 + i * 13)) for i in range(10)]
    )
    spark.createDataFrame(rows, "doc_id string, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "in"))

    env = os.environ.copy()
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    env["PYSPARK_SUBMIT_ARGS"] = "--master local[2] pyspark-shell"
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "jobs", "dedup_job.py"),
         "--input", str(tmp_path / "in"),
         "--output", str(tmp_path / "out"),
         "--stats", str(tmp_path / "stats.json")],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report == json.loads((tmp_path / "stats.json").read_text())
    assert report["docs"] == 17
    assert report["duplicates"] == 4
    assert report["components"] == 13
    assert report["lsh_n_dropped_memberships"] == 0

    out = {r["doc_id"]: r for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    assert set(out) == {r[0] for r in rows}
    # canonical = min id per group; singletons survive as themselves
    assert [out[f"a{i}"]["component"] for i in range(3)] == ["a0"] * 3
    assert [out[f"a{i}"]["is_duplicate"] for i in range(3)] == [
        False, True, True]
    assert out["b1"]["component"] == "b0" and out["b1"]["is_duplicate"]
    assert out["n1"]["component"] == "n0" and out["n1"]["is_duplicate"]
    assert all(not out[f"u{i}"]["is_duplicate"] for i in range(10))
