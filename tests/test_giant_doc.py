"""Oversized-document stress.

arrow mode handles a 4000-page (~45k-span) book linearly; hof mode is
exercised at 400 pages (its fold accumulator is O(n²) per doc — the scale
paths for bigger books are arrow mode or salting, see
operators/dehyphen.py and test_salting.py).
"""

from __future__ import annotations

import time

from ocrd_odem_spark import gen, oracle
from ocrd_odem_spark.plans import pipeline
from ocrd_odem_spark.schema import DOCS_SCHEMA


def _golden(doc):
    return [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in oracle.extract_document_dehyphenated(doc["spans"])
    ]


def _got(df, mode):
    rows = pipeline.extract(df, dehyphenate=True, mode=mode).collect()
    return [
        (s["kind"], s["text"], s["media_ref"], s["offset"])
        for s in rows[0]["spans"]
    ]


def test_giant_doc_arrow_linear(spark):
    doc = gen.make_document(5, 0, n_pages=4000)
    assert len(doc["spans"]) > 30000
    df = spark.createDataFrame([doc], DOCS_SCHEMA)
    t0 = time.time()
    assert _got(df, "arrow") == _golden(doc)
    assert time.time() - t0 < 120  # linear path: seconds, not minutes


def test_big_doc_hof(spark):
    doc = gen.make_document(5, 1, n_pages=400)
    df = spark.createDataFrame([doc], DOCS_SCHEMA)
    assert _got(df, "hof") == _golden(doc)
