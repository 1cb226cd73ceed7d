"""Keyed state across micro-batches: profiles accumulate over restarts."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ocrd_odem_spark.streaming.stateful import user_profiles_stream


def _drain(spark, src, ckpt, out_dir):
    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        user_profiles_stream(stream)
        .writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode emits one row per key per batch: latest (max count) wins
    rows = spark.read.parquet(out_dir).collect()
    best: dict = {}
    for r in rows:
        cur = best.get(r["user_id"])
        if cur is None or r["n_events"] > cur["n_events"]:
            best[r["user_id"]] = r
    return best


def test_stateful_profiles_accumulate_across_restarts(spark):
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    first = events.where(F.col("event_id") % 2 == 0)
    second = events.where(F.col("event_id") % 2 == 1)

    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt, outd = f"{tmp}/src", f"{tmp}/ckpt", f"{tmp}/out"
        first.write.parquet(src)
        got1 = _drain(spark, src, ckpt, outd)
        half_counts = {u: r["n_events"] for u, r in got1.items()}

        # restart with the second half appended: state carries over
        second.write.mode("append").parquet(src)
        got2 = _drain(spark, src, ckpt, outd)

        want = {
            r["user_id"]: (r["n"], round(r["s"], 4))
            for r in events.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
            .collect()
        }
        for user, (n, s) in want.items():
            if user not in got2:  # user only in first half: no update emitted
                assert half_counts.get(user) == n
                continue
            row = got2[user]
            assert row["n_events"] == n, (user, row["n_events"], n)
            assert abs(row["sum_value"] - s) < 1e-6
        assert any(
            got2[u]["n_events"] > half_counts.get(u, 0) for u in got2
        ), "state did not accumulate across the restart"


def test_streaming_exact_dedup_across_restarts(spark):
    """Each distinct text is emitted exactly once across micro-batches AND
    a query restart; the first-seen doc survives and later exact
    duplicates are suppressed in keyed state."""
    import tempfile

    from ocrd_odem_spark.streaming.stateful import exact_dedup_stream

    schema = "doc_id string, text string"
    first = [(f"d{i:02d}", f"text {i % 5}") for i in range(10)]   # 5 distinct
    second = [(f"e{i:02d}", f"text {i % 8}") for i in range(16)]  # 3 new

    def drain(src, ckpt, outd):
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(outd)

        q = (
            exact_dedup_stream(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return spark.read.parquet(outd).collect()

    with tempfile.TemporaryDirectory() as tmp:
        src, ckpt, outd = f"{tmp}/src", f"{tmp}/ckpt", f"{tmp}/out"
        spark.createDataFrame(first, schema).coalesce(1).write.parquet(src)
        got1 = drain(src, ckpt, outd)
        # 5 distinct texts, each emitted once, keeper = min doc_id
        assert sorted(r["doc_id"] for r in got1) == [
            "d00", "d01", "d02", "d03", "d04"]

        # restart with 16 more docs appended: texts 0-4 are known to state,
        # texts 5-7 are new -> exactly three more emissions
        spark.createDataFrame(second, schema).coalesce(1).write.mode(
            "append").parquet(src)
        got2 = drain(src, ckpt, outd)
        assert len(got2) == 8
        by_text = {r["text"]: r["doc_id"] for r in got2}
        assert len(by_text) == 8  # no text emitted twice
        for i in range(5):  # survivors from the first run keep their keeper
            assert by_text[f"text {i}"] == f"d{i:02d}"
        for i in range(5, 8):
            assert by_text[f"text {i}"] == f"e{i:02d}"
