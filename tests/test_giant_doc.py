"""Oversized-document stress.

Both modes handle a 4000-page (~45k-span) book: arrow via the linear
Python loop, hof via the size-gated linear dehyphenation tier (the exact
O(n²) fold only runs for small or chain-prone documents — see
operators/dehyphen.py).
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


def test_giant_doc_both_modes_linear(spark):
    doc = gen.make_document(5, 0, n_pages=4000)
    assert len(doc["spans"]) > 30000
    df = spark.createDataFrame([doc], DOCS_SCHEMA)
    golden = _golden(doc)
    for mode in ("arrow", "hof"):
        t0 = time.time()
        assert _got(df, mode) == golden, mode
        assert time.time() - t0 < 150, mode  # linear tiers: seconds, not minutes


def test_big_chainy_doc_exact_fold(spark):
    """A big doc WITH chain-prone lines falls back to the exact fold."""
    doc = gen.make_document(5, 1, n_pages=400)
    # inject chain-prone single-token hyphen lines
    for s in doc["spans"][:200]:
        if s["kind"] == "text" and s["offset"] % 7 == 3:
            s["text"] = "solo-"
    df = spark.createDataFrame([doc], DOCS_SCHEMA)
    assert _got(df, "hof") == _golden(doc)
