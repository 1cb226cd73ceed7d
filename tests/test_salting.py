"""Skew salting: oversized docs split page-aligned; salted == unsalted."""

from __future__ import annotations

from pyspark.sql import functions as F

from ocrd_odem_spark import gen, oracle
from ocrd_odem_spark.operators import salting
from ocrd_odem_spark.plans import pipeline
from ocrd_odem_spark.schema import DOCS_SCHEMA


def test_salted_extract_equals_unsalted(spark):
    corpus = gen.make_corpus(7, 8, oversized_every=4, oversized_pages=120)
    docs = spark.createDataFrame(corpus, DOCS_SCHEMA)

    salted = salting.salt_oversized(docs, max_spans=200)
    n_chunks = salted.groupBy("doc_id").count().collect()
    chunks = {r["doc_id"]: r["count"] for r in n_chunks}
    big = [d["doc_id"] for d in corpus if len(d["spans"]) > 400]
    assert big and all(chunks[b] > 1 for b in big), chunks
    small = [d["doc_id"] for d in corpus if len(d["spans"]) <= 200]
    assert all(chunks[s] == 1 for s in small)

    # chunks split on page boundaries only: every chunk starts with media
    first = salted.select(
        F.col("spans")[0]["kind"].alias("k")
    ).collect()
    assert all(r["k"] == "media" for r in first)

    # per-chunk extraction (incl. page-scoped dehyphenation) then de-salt
    # equals the unsalted run exactly
    extracted_chunks = pipeline.extract(
        salted.select("doc_id", "spans"), dehyphenate=True
    ).withColumn("salt", F.lit(None))
    # carry salt through: re-join chunk order by re-salting deterministically
    chunk_out = pipeline.extract(
        salted.select(F.concat("doc_id", F.lit("#"), "salt").alias("doc_id"), "spans"),
        dehyphenate=True,
    )
    resplit = chunk_out.select(
        F.split("doc_id", "#")[0].alias("doc_id"),
        F.split("doc_id", "#")[1].cast("int").alias("salt"),
        "spans",
    )
    reassembled = salting.unsalt(resplit)
    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]] for r in reassembled.collect()
    }
    want = {
        d["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle.extract_document_dehyphenated(d["spans"])
        ]
        for d in corpus
    }
    assert got == want


def test_extract_salted_library_helper(spark):
    corpus = gen.make_corpus(11, 5, oversized_every=5, oversized_pages=100)
    docs = spark.createDataFrame(corpus, DOCS_SCHEMA)
    got = {
        r["doc_id"]: [tuple(s) for s in r["spans"]]
        for r in salting.extract_salted(docs, max_spans=150, dehyphenate=True).collect()
    }
    want = {
        d["doc_id"]: [
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in oracle.extract_document_dehyphenated(d["spans"])
        ]
        for d in corpus
    }
    assert got == want
