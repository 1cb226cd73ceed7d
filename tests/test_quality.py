"""Quality-path parity: page_text_stats vs the oracle's textlines2data."""

from __future__ import annotations

from ocrd_odem_spark import oracle
from ocrd_odem_spark.constants import KIND_TEXT
from ocrd_odem_spark.operators import quality


def test_page_text_stats_matches_oracle(spark, corpus, docs_df):
    rows = quality.page_text_stats(docs_df).collect()
    actual = {
        (r["doc_id"], r["media_ref"]): (
            r["file_string"], r["n_lines"], r["n_normalized"], r["n_sparse"], r["n_dense"]
        )
        for r in rows
    }
    checked = 0
    for doc in corpus:
        pages: dict[str, list[str]] = {}
        for s in sorted(doc["spans"], key=lambda s: s["offset"]):
            if s["kind"] == KIND_TEXT:
                pages.setdefault(s["media_ref"], []).append(s["text"])
        for ref, lines in pages.items():
            st = oracle.textlines_to_data(lines)
            key = (doc["doc_id"], ref)
            assert key in actual, f"missing page row {key}"
            assert actual[key] == (
                st.file_string, st.n_lines, st.n_normalized, st.n_sparse, st.n_dense
            ), f"{key}: {actual[key]} != oracle {st}"
            checked += 1
    assert checked > 100


def test_estimation_bins(spark):
    scores = [(12.0,), (30.1,), (75.0,), (99.9,), (44.0,), (0.0,)]
    df = spark.createDataFrame(scores, "score double")
    rows = {r["bin"]: r["n"] for r in quality.estimation_bins(df).collect()}
    mean, counts = oracle.estimation_bins([s[0] for s in scores])
    for b in range(5):
        assert rows.get(b, 0) == counts[b], (b, rows, counts)
