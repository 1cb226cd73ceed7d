"""Exact-resume protocol: crash mid-run -> rerun -> identical output, no dupes."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ocrd_odem_spark.plans import pipeline
from ocrd_odem_spark.sources import state


def _transform(df):
    return pipeline.extract(df, dehyphenate=True)


def test_crash_resume_no_dupes(spark, docs_df, corpus):
    with tempfile.TemporaryDirectory() as tmp:
        out_dir = f"{tmp}/out"
        st_dir = f"{tmp}/state"

        # crash after publishing 3 of 16 buckets
        r1 = state.run_with_checkpoint(
            spark, docs_df, _transform, out_dir, st_dir,
            n_buckets=16, fail_after_buckets=3,
        )
        assert r1["published"] == 3

        # resume: remaining buckets processed, completed ones skipped
        r2 = state.run_with_checkpoint(
            spark, docs_df, _transform, out_dir, st_dir, n_buckets=16
        )
        assert r2["skipped"] == 3
        assert r1["published"] + r2["published"] >= 16 - 3

        out = state.read_output(spark, out_dir)
        ids = [r["doc_id"] for r in out.select("doc_id").collect()]
        assert sorted(ids) == sorted(d["doc_id"] for d in corpus), "dupes or losses"

        # third run is a complete no-op
        r3 = state.run_with_checkpoint(
            spark, docs_df, _transform, out_dir, st_dir, n_buckets=16
        )
        assert r3["published"] == 0

        # output equals a direct single-shot run
        direct = {
            r["doc_id"]: [tuple(s) for s in r["spans"]]
            for r in _transform(docs_df).collect()
        }
        resumed = {
            r["doc_id"]: [tuple(s) for s in r["spans"]]
            for r in out.collect()
        }
        assert direct == resumed

        # lineage metrics cover every bucket with plausible counts,
        # including the north rule's extraction metrics: pages parsed,
        # spans emitted, de-hyphenation fixes per partition
        metrics = state.StateStore(st_dir).metrics(spark)
        agg = metrics.agg(
            F.sum("n_docs").alias("docs"),
            F.countDistinct("bucket").alias("buckets"),
            F.sum("n_pages").alias("pages"),
            F.sum("n_spans_out").alias("spans"),
            F.min("n_dehyphenated").alias("min_fixes"),
        ).collect()[0]
        assert agg["docs"] == len(corpus)
        n_media = sum(
            1 for d in corpus for s in d["spans"] if s["kind"] == "media"
        )
        assert agg["pages"] == n_media
        assert agg["spans"] > 0
        assert agg["min_fixes"] == 0  # plain extract emits no metrics column


def test_writer_lock_guards_concurrent_runs(spark, docs_df, tmp_path):
    """Two runs sharing an output_path must not sweep each other's live
    staging (ADVICE r2): a live lock rejects the second writer; a stale
    lock (dead pid) is reclaimed."""
    import os

    import pytest as _pytest

    out_dir = str(tmp_path / "out")
    st_dir = str(tmp_path / "state")
    os.makedirs(out_dir, exist_ok=True)

    # simulate a LIVE concurrent writer (our own pid is alive)
    lock = os.path.join(out_dir, "_writer.lock")
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write(f"{os.getpid()}:deadbeef0000")
    with _pytest.raises(RuntimeError, match="locked by live writer"):
        state.run_with_checkpoint(
            spark, docs_df, lambda d: d, out_dir, st_dir, n_buckets=4
        )

    # a crashed writer (dead pid) leaves a stale lock -> reclaimed, run ok
    with open(lock, "w", encoding="utf-8") as fh:
        fh.write("999999999:deadbeef0000")
    r = state.run_with_checkpoint(
        spark, docs_df, lambda d: d, out_dir, st_dir, n_buckets=4
    )
    assert r["published"] > 0
    assert not os.path.exists(lock)  # released on exit


def test_lineage_carries_dehyphenation_fixes(spark, docs_df, corpus, tmp_path):
    """A metrics-emitting transform (extract with_metrics=True) folds its
    de-hyphenation fix counts into the per-bucket lineage."""
    out_dir = str(tmp_path / "out")
    st_dir = str(tmp_path / "state")
    r = state.run_with_checkpoint(
        spark, docs_df,
        lambda d: pipeline.extract(d, dehyphenate=True, with_metrics=True),
        out_dir, st_dir, n_buckets=8,
    )
    assert r["published"] == 8
    agg = state.StateStore(st_dir).metrics(spark).agg(
        F.sum("n_dehyphenated").alias("fixes"),
        F.sum("n_pages").alias("pages"),
    ).collect()[0]
    n_fixes_direct = (
        pipeline.extract(docs_df, dehyphenate=True, with_metrics=True)
        .agg(F.sum("n_dehyphenated")).collect()[0][0]
    )
    assert agg["fixes"] == n_fixes_direct and n_fixes_direct > 0
    n_media = sum(1 for d in corpus for s in d["spans"] if s["kind"] == "media")
    assert agg["pages"] == n_media
