"""Per-partition watermark checkpointing with exact resume (S1/S9).

The reference engine's record state machine (``n.a. -> ocr_busy ->
ocr_done/fail/skip``, ``lib/odem/commons.py:21-26``; claim/save at
``cli_record_local.py:108-122,182``) becomes a partition-state table: the
corpus is bucketed on ``xxhash64(doc_id)``, each bucket is processed
idempotently, and a bucket's output commit + state append are ordered so a
crash anywhere yields either "bucket fully visible and marked done" or
"bucket re-processed from scratch on resume" — never duplicates.

On a real deployment both tables are Iceberg and the state commit is a
``MERGE INTO`` with snapshot atomicity; this sandbox implementation
emulates the snapshot contract directly — data files are invisible until
ONE manifest file appears by atomic rename:

    1. pending = all buckets  ANTI JOIN  state(done)      -- partition prune
    2. stage output for pending buckets (``_staging_<run_id>``)
    3. ONE aggregation over staging computes every bucket's lineage
       metrics
    4. staged bucket dirs move under ``_data/<run_id>/`` — still invisible
       to readers
    5. COMMIT: one manifest (bucket -> data path + stats) is fsync'd and
       renamed into ``_commits/<seq>_<run_id>.json``; readers resolve
       visibility ONLY through manifests (latest commit per bucket wins),
       so there is no torn-read window — before the rename they see none
       of the run's buckets, after it all of them.  (Directory-rename
       publishing, the r4 protocol, had N visibility events and is
       copy+delete — non-atomic — on S3-like object storage.)
    6. ONE state append marks the committed buckets done — O(1) Spark
       jobs per run, not O(n_buckets) serial driver round-trips

Re-running a completed workload is a no-op; re-running after a crash at
ANY point — mid-stage, after the data move but before the commit, or
between commit and state append — recomputes exactly the buckets that are
not state-marked, and uncommitted data/staging debris is swept under the
writer lock.
"""

from __future__ import annotations

import fcntl
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..constants import MARK_DONE

# Explicit read schema: the state table gained n_pages/n_dehyphenated after
# round 2.  Schema inference samples ONE footer, so a state dir mixing
# pre-upgrade 5-column and current 7-column files would nondeterministically
# drop the new columns or throw; reading with the declared schema makes old
# files surface nulls deterministically instead (ADVICE r3).
STATE_SCHEMA = (
    "bucket int, state string, n_docs long, n_spans_out long, "
    "n_pages long, n_dehyphenated long, run_id string"
)


class StateStore:
    """Parquet-backed watermark/state table (Iceberg MERGE stand-in)."""

    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    def done_buckets(self, spark: SparkSession) -> list[int]:
        """Distinct done bucket ids.

        r6: read directly with pyarrow — the state table is metadata-scale
        (one row per bucket), so a Spark job here was pure scheduler
        overhead (guide §1.2: remove work, then tune); the parquet layout
        is unchanged and ``metrics()`` still serves the table as a
        DataFrame."""
        import pyarrow.parquet as pq

        files = [f for f in os.listdir(self.path) if f.endswith(".parquet")]
        done: set[int] = set()
        for name in files:
            t = pq.read_table(
                os.path.join(self.path, name), columns=["bucket", "state"]
            )
            for b, st in zip(t.column("bucket").to_pylist(),
                             t.column("state").to_pylist()):
                if st == MARK_DONE:
                    done.add(int(b))
        return sorted(done)

    def mark_done(self, spark: SparkSession, rows: list[dict], run_id: str) -> None:
        """Append one done-record per bucket (atomic single-file write).

        Lineage per bucket: docs, spans emitted, pages parsed (media spans)
        and de-hyphenation fixes — the reference's extraction metrics
        (pages / spans / dehyph counts) per partition.

        r6: written with pyarrow (same schema/layout — ``metrics()`` and
        old readers are unaffected): a Spark job to persist a
        bucket-per-row metadata table cost two scheduler round-trips per
        run."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table(
            {
                "bucket": pa.array([int(r["bucket"]) for r in rows], pa.int32()),
                "state": pa.array([MARK_DONE] * len(rows), pa.string()),
                "n_docs": pa.array([int(r["n_docs"]) for r in rows], pa.int64()),
                "n_spans_out": pa.array(
                    [int(r["n_spans_out"]) for r in rows], pa.int64()
                ),
                "n_pages": pa.array(
                    [int(r.get("n_pages", 0)) for r in rows], pa.int64()
                ),
                "n_dehyphenated": pa.array(
                    [int(r.get("n_dehyphenated", 0)) for r in rows], pa.int64()
                ),
                "run_id": pa.array([run_id] * len(rows), pa.string()),
            }
        )
        tmp = os.path.join(
            os.path.dirname(self.path), f"_state_tmp_{uuid.uuid4().hex}.parquet"
        )
        pq.write_table(table, tmp)
        os.replace(
            tmp, os.path.join(self.path, f"{run_id}_{uuid.uuid4().hex}.parquet")
        )

    def metrics(self, spark: SparkSession) -> DataFrame:
        return spark.read.schema(STATE_SCHEMA).parquet(self.path)


def run_with_checkpoint(
    spark: SparkSession,
    docs: DataFrame,
    transform,
    output_path: str,
    state_path: str,
    n_buckets: int = 64,
    fail_after_buckets: int | None = None,
    fail_before_commit: bool = False,
) -> dict:
    """Process ``docs`` through ``transform`` with exact-resume semantics.

    ``transform``: (DataFrame of (doc_id, spans)) -> same shape.
    ``fail_after_buckets``: test hook — commit only that many buckets and
    stop (simulates a mid-run crash after a partial snapshot commit).
    ``fail_before_commit``: test hook — stop after the data move but
    BEFORE the manifest commit (crash in the publish window; the staged
    data must stay invisible to readers and re-process on resume).

    Returns {"published": int, "skipped": int, "run_id": str}.
    """
    run_id = uuid.uuid4().hex[:12]
    store = StateStore(state_path)
    os.makedirs(output_path, exist_ok=True)

    # single-writer guard: two concurrent runs sharing an output_path would
    # sweep each other's LIVE staging below and interleave bucket renames.
    # The guard is an fcntl.flock held on a persistent fd for the whole run:
    # the kernel releases it automatically when a crashed holder's fd closes,
    # so there is no stale-lock reclaim step to race on (the old pid-in-file
    # scheme had a check-then-unlink TOCTOU where two resuming runs could
    # both observe a dead holder and the slower unlink the winner's fresh
    # lock, and a recycled pid read as live — ADVICE r3).
    lock_fd = _acquire_writer_lock(output_path, run_id)
    try:
        # sweep debris left by crashed runs — resume uses a fresh run_id,
        # so stale _staging_<old> dirs and UNCOMMITTED _data/<old> dirs
        # (moved but never manifest-committed: invisible to readers) would
        # otherwise leak forever (safe under the writer lock: no other run
        # can be mid-write here; committed data dirs are immutable)
        for name in os.listdir(output_path):
            if name.startswith("_staging_"):
                shutil.rmtree(os.path.join(output_path, name), ignore_errors=True)
        data_root = os.path.join(output_path, _DATA_DIR)
        if os.path.isdir(data_root):
            committed = _committed_run_ids(output_path)
            for rid in os.listdir(data_root):
                if rid not in committed:
                    shutil.rmtree(os.path.join(data_root, rid), ignore_errors=True)
        return _run_with_checkpoint_locked(
            spark, docs, transform, output_path, store, run_id,
            n_buckets, fail_after_buckets, fail_before_commit,
        )
    finally:
        _release_writer_lock(lock_fd)


def _lock_path(output_path: str) -> str:
    return os.path.join(output_path, "_writer.lock")


def _acquire_writer_lock(output_path: str, run_id: str) -> int:
    """Take an exclusive non-blocking flock on the lock file; return the fd.

    The fd stays open for the run's lifetime — the lock dies with the
    process (kernel-released on crash), so staleness never has to be
    inferred from pids.  flock is per open-file-description, so a second
    acquire in the SAME process conflicts too.  The pid:run_id contents are
    diagnostic only, never used for liveness decisions.
    """
    fd = os.open(_lock_path(output_path), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except BlockingIOError:
        try:
            holder = os.read(fd, 256).decode("utf-8", "replace")
        finally:
            os.close(fd)
        raise RuntimeError(
            f"output_path {output_path!r} is locked by live writer "
            f"({holder or 'unknown'}); concurrent runs on one output_path "
            "are not supported"
        )
    os.ftruncate(fd, 0)
    os.write(fd, f"{os.getpid()}:{run_id}".encode())
    return fd


def _release_writer_lock(fd: int) -> None:
    try:
        os.ftruncate(fd, 0)
        os.close(fd)  # closes the descriptor -> kernel drops the flock
    except OSError:
        pass


def _run_with_checkpoint_locked(
    spark: SparkSession,
    docs: DataFrame,
    transform,
    output_path: str,
    store: "StateStore",
    run_id: str,
    n_buckets: int,
    fail_after_buckets: int | None,
    fail_before_commit: bool = False,
) -> dict:

    bucket = F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
    done = store.done_buckets(spark)
    pending_docs = docs.withColumn("_bucket", bucket)
    if done:
        pending_docs = pending_docs.where(~F.col("_bucket").isin(done))

    if fail_after_buckets is not None:
        # r6 crash-scope prune (guide §1.2: don't compute what you throw
        # away): a run that will crash after publishing N buckets never
        # benefits from staging the rest — resume recomputes them from
        # scratch either way.  Scope = the first N non-empty pending
        # buckets in the same lexical order the publish loop walks the
        # staged dirs, so the published set (and every counter) is
        # unchanged.
        nonempty = sorted(
            (int(r["_bucket"]) for r in
             pending_docs.select("_bucket").distinct().collect()),
            key=str,
        )
        scope = nonempty[:fail_after_buckets]
        pending_docs = pending_docs.where(F.col("_bucket").isin(scope))

    out = transform(pending_docs.select("doc_id", "spans")).withColumn(
        "_bucket", bucket
    )

    staging = os.path.join(output_path, f"_staging_{run_id}")
    # r6 (guide §6 output sizing): align write tasks with the publish unit —
    # without the repartition every upstream partition wrote a sliver into
    # every bucket dir (partitions x buckets files, e.g. 32x16=512 per run);
    # one exchange of the output keyed on the bucket id yields one
    # well-sized file per bucket, which the stats aggregation, the rename
    # loop and every later read pay for.  The transform still runs at full
    # upstream parallelism (the exchange is downstream of it).
    out.repartition(n_buckets, "_bucket").write.mode("overwrite").partitionBy(
        "_bucket"
    ).parquet(staging)

    # ONE aggregation over the whole staging dir for every bucket's lineage
    # stats — not one Spark job per bucket (512 buckets were 512 serial
    # driver round-trips; VERDICT r1 item 5).  The rename loop below is pure
    # filesystem work, and the state append is a single write.
    bucket_dirs = sorted(
        n for n in os.listdir(staging) if n.startswith("_bucket=")
    )
    stats_by_bucket: dict[int, dict] = {}
    if bucket_dirs:
        staged = spark.read.parquet(staging)
        # the north rule's per-partition extraction metrics: pages parsed
        # (media spans) derive from the output; de-hyphenation fixes fold
        # in when the transform emitted its metrics column (extract
        # with_metrics=True), else 0
        fixes = (
            F.coalesce(F.sum("n_dehyphenated"), F.lit(0))
            if "n_dehyphenated" in staged.columns
            else F.lit(0)
        )
        agg = (
            staged.groupBy("_bucket")
            .agg(
                F.count("*").alias("n_docs"),
                F.coalesce(F.sum(F.size("spans")), F.lit(0)).alias("n_spans"),
                F.coalesce(
                    F.sum(
                        F.size(F.filter("spans", lambda s: s["kind"] == "media"))
                    ),
                    F.lit(0),
                ).alias("n_pages"),
                fixes.alias("n_dehyphenated"),
            )
            .collect()
        )
        stats_by_bucket = {
            int(r["_bucket"]): {
                "n_docs": r["n_docs"],
                "n_spans": r["n_spans"],
                "n_pages": r["n_pages"],
                "n_dehyphenated": r["n_dehyphenated"],
            }
            for r in agg
        }

    # --- snapshot publish (Iceberg commit contract, SURVEY §7.6) --------
    # Data files move into an UNCOMMITTED per-run directory first; they
    # become visible only when ONE manifest file appears atomically under
    # _commits/.  A reader can therefore never observe a torn subset of a
    # run's buckets: before the manifest rename it sees none of them, after
    # it it sees all of them.  (The r4 protocol renamed each bucket dir
    # into the output root — correct on POSIX local fs, but N separate
    # visibility events; on S3-like storage rename is copy+delete and a
    # crash mid-loop left a torn, reader-visible prefix.)
    published = []
    truncated = False
    data_dir = os.path.join(output_path, _DATA_DIR, run_id)
    if bucket_dirs:
        os.makedirs(data_dir, exist_ok=True)
    for name in bucket_dirs:
        b = int(name.split("=", 1)[1])
        shutil.move(os.path.join(staging, name), os.path.join(data_dir, name))
        published.append(b)
        if fail_after_buckets is not None and len(published) >= fail_after_buckets:
            truncated = True
            break
    if fail_before_commit:
        # test hook: crash AFTER the data move, BEFORE the manifest commit —
        # the new crash point the rename protocol could not express.  The
        # moved data must stay invisible to read_output and the buckets
        # must re-process on resume.
        return {"published": 0, "skipped": len(done), "run_id": run_id}
    if published:
        _commit_manifest(output_path, run_id, published, stats_by_bucket)
    if published:
        store.mark_done(
            spark,
            [
                {
                    "bucket": b,
                    "n_docs": stats_by_bucket[b]["n_docs"],
                    "n_spans_out": stats_by_bucket[b]["n_spans"],
                    "n_pages": stats_by_bucket[b]["n_pages"],
                    "n_dehyphenated": stats_by_bucket[b]["n_dehyphenated"],
                }
                for b in published
            ],
            run_id,
        )
    if truncated:
        shutil.rmtree(staging, ignore_errors=True)
        return {"published": len(published), "skipped": len(done), "run_id": run_id}
    shutil.rmtree(staging, ignore_errors=True)
    return {"published": len(published), "skipped": len(done), "run_id": run_id}


_DATA_DIR = "_data"
_COMMITS_DIR = "_commits"


def _commits_path(output_path: str) -> str:
    return os.path.join(output_path, _COMMITS_DIR)


def _commit_manifest(
    output_path: str,
    run_id: str,
    buckets: list[int],
    stats_by_bucket: dict[int, dict],
) -> str:
    """Make this run's staged buckets visible in ONE atomic step.

    The manifest is written to a temp name, fsync'd, then renamed into
    ``_commits/<seq>_<run_id>.json`` — the rename is the commit (the same
    contract as an Iceberg snapshot's metadata swap).  ``seq`` is a dense
    commit counter so readers can resolve "latest wins" when a bucket was
    re-published after a crash between commit and state append."""
    import json

    cdir = _commits_path(output_path)
    os.makedirs(cdir, exist_ok=True)
    seqs = [
        int(n.split("_", 1)[0])
        for n in os.listdir(cdir)
        if n.endswith(".json") and n.split("_", 1)[0].isdigit()
    ]
    seq = (max(seqs) + 1) if seqs else 1
    manifest = {
        "seq": seq,
        "run_id": run_id,
        "buckets": {
            str(b): f"{_DATA_DIR}/{run_id}/_bucket={b}" for b in buckets
        },
        "stats": {str(b): stats_by_bucket.get(b, {}) for b in buckets},
    }
    tmp = os.path.join(cdir, f"_tmp_{run_id}")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh)
        fh.flush()
        os.fsync(fh.fileno())
    final = os.path.join(cdir, f"{seq:08d}_{run_id}.json")
    os.rename(tmp, final)  # THE commit: one atomic visibility event
    dfd = os.open(cdir, os.O_RDONLY)
    try:
        os.fsync(dfd)  # durable directory entry before state append
    finally:
        os.close(dfd)
    return final


def _committed_buckets(output_path: str) -> dict[int, str]:
    """bucket -> committed relative data path, latest commit wins."""
    import json

    cdir = _commits_path(output_path)
    if not os.path.isdir(cdir):
        return {}
    latest: dict[int, str] = {}
    for name in sorted(n for n in os.listdir(cdir) if n.endswith(".json")):
        with open(os.path.join(cdir, name)) as fh:
            m = json.load(fh)
        for b, rel in m["buckets"].items():
            latest[int(b)] = rel
    return latest


def _committed_run_ids(output_path: str) -> set[str]:
    import json

    cdir = _commits_path(output_path)
    if not os.path.isdir(cdir):
        return set()
    rids: set[str] = set()
    for name in os.listdir(cdir):
        if name.endswith(".json"):
            with open(os.path.join(cdir, name)) as fh:
                rids.add(json.load(fh)["run_id"])
    return rids


def read_output(spark: SparkSession, output_path: str) -> DataFrame:
    """Snapshot-isolated read: only manifest-committed buckets are
    visible (latest commit per bucket).  Falls back to a direct parquet
    read for pre-manifest output layouts."""
    committed = _committed_buckets(output_path)
    if not committed:
        return spark.read.parquet(output_path).select("doc_id", "spans")
    paths = sorted(
        os.path.join(output_path, rel) for rel in set(committed.values())
    )
    # legacy pre-manifest layouts published buckets as root-level
    # _bucket= dirs; a manifest-protocol run appending to such an output
    # must not make them invisible (they are state-marked done and would
    # be neither read nor reprocessed — ADVICE r5)
    legacy = sorted(
        os.path.join(output_path, n)
        for n in os.listdir(output_path)
        if n.startswith("_bucket=")
    )
    return spark.read.parquet(*paths, *legacy).select("doc_id", "spans")
