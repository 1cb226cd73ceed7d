"""Bucketed tables: repeated doc_id joins run without shuffle exchanges."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocrd_odem_spark.plans import pipeline
from ocrd_odem_spark.sources import tables


def test_bucketed_join_is_shuffle_free(spark, docs_df):
    extracted = pipeline.extract(docs_df, with_metrics=True)
    tables.write_bucketed(extracted.select("doc_id", "spans"), "bk_spans", n_buckets=8)
    tables.write_bucketed(
        extracted.select("doc_id", "n_pages", "n_lines_out"), "bk_metrics", n_buckets=8
    )

    # small sides would normally broadcast; force the sort-merge path to
    # observe the bucket co-location itself (on a 100 TB fact table there is
    # no broadcast option — this IS the production plan shape)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = tables.colocated_join(spark, "bk_spans", "bk_metrics")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "ShuffleExchange" not in plan.replace("Exchange hashpartitioning", "ShuffleExchange"), plan
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert "Bucketed: true" in plan, plan

        rows = joined.collect()
        assert len(rows) == docs_df.count()
        assert all(r["n_pages"] >= 1 for r in rows)

        # a non-bucketed side joins too, but pays the shuffle — the layout
        # is what removes it
        other = docs_df.select("doc_id", F.size("spans").alias("n"))
        mixed = spark.table("bk_spans").join(other, "doc_id")
        mixed_plan = mixed._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in mixed_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
