"""Round-6 optimization equivalence guards.

Each r6 rewrite replaced an interpreted-expression form with a vectorised
Arrow/numpy form whose arithmetic must be bit-identical.  These tests pin
the new fast paths to the original expression-level semantics on corpora
with edge shapes (empty text, single token, duplicates, null-ish rows).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocrd_odem_spark.functions import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i j"),      # exact dup of 1
        (3, "a b c d e f g h i X"),      # near dup
        (4, "z"),                          # single token
        (5, "z y"),                        # two tokens (short shingle tail)
        (6, ""),                           # empty text -> one empty token
        (7, "q w e r t y u i o p a s d f"),
        (8, "unrelated words entirely here present"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_md5_minhash_matches_expression_tier(spark, docs):
    """Arrow signature stage == the HOF SQL tier, string for string."""
    toks = "split(text, ' ')"
    shingles = (
        f"array_distinct(transform(sequence(0, greatest(size({toks}) - 2, 1) - 1), "
        f"i -> array_join(slice({toks}, i + 1, 3), ' ')))"
    )
    exprs = [
        F.expr(
            f"array_min(transform({shingles}, s -> substr(md5(concat('{seed}|', s)), 1, 16)))"
        ).alias(f"s{seed}")
        for seed in range(8)
    ]
    expected = {r["doc_id"]: tuple(r)[1:] for r in docs.select("doc_id", *exprs).collect()}
    got = {
        r["doc_id"]: tuple(r)[1:]
        for r in dedup.md5_minhash_signatures(docs, n_seeds=8).collect()
    }
    assert got == expected


def test_simhash_md5_arrow_matches_agg(spark, docs):
    """Arrow per-doc simhash == the codegen vote aggregation, bit for bit."""
    agg = {
        r["id"]: r["sh"]
        for r in dedup.simhash64_agg(docs, hash_fn=dedup.md5_hash60).collect()
    }
    arrow = {
        r["id"]: r["sh"]
        for r in dedup._simhash64_md5_arrow(docs, "text", "doc_id").collect()
    }
    assert arrow == agg


def test_simhash_pairs_match_join_form(spark, docs):
    """Value-compressed pair derivation == the naive blocked self-join."""
    sim = dedup.simhash64_agg(docs, hash_fn=dedup.md5_hash60)
    blocked = sim.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(4)),
                lambda i: F.struct(
                    i.alias("block"),
                    F.call_function("shiftright", F.col("sh"), (i * 12).cast("int"))
                    .bitwiseAND(F.lit((1 << 12) - 1))
                    .alias("key"),
                ),
            )
        ).alias("bk"),
    ).select("id", "sh", "bk.block", "bk.key")
    left, right = blocked.alias("l"), blocked.alias("r")
    naive = (
        left.join(
            right,
            (F.col("l.block") == F.col("r.block"))
            & (F.col("l.key") == F.col("r.key"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.bit_count(F.col("l.sh").bitwiseXOR(F.col("r.sh"))).alias("hamming"),
        )
        .distinct()
        .where(F.col("hamming") <= 4)
    )
    expected = sorted(map(tuple, naive.collect()))
    got = sorted(
        map(
            tuple,
            dedup.simhash_near_duplicates(
                docs, max_hamming=4, block_bits=12, hash_fn=dedup.md5_hash60
            ).collect(),
        )
    )
    assert got == expected


def test_score_pairs_arrow_matches_hof_cosine(spark):
    """Vectorised pair scoring == interpreted cosine fold (incl. rounding),
    on vectors engineered to stress summation order (alternating signs,
    magnitude spread)."""
    import random

    rng = random.Random(13)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1, 1) * (10 ** rng.randint(-3, 2)) for _ in range(64)]
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("_va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("_vb"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    hof = pairs.select(
        "id_a", "id_b",
        F.round(similarity.cosine(F.col("_va"), F.col("_vb")), 6).alias("sim"),
    )
    fast = similarity._score_pairs_arrow(pairs, "_va", "_vb").select(
        "id_a", "id_b", F.round(F.col("sim"), 6).alias("sim")
    )
    eh = {(r["id_a"], r["id_b"]): r["sim"] for r in hof.collect()}
    ef = {(r["id_a"], r["id_b"]): r["sim"] for r in fast.collect()}
    assert ef == eh


def test_cosine_near_duplicates_matches_reference_shape(spark):
    """Bucketed pair generation: no self pairs, id_a < id_b, every emitted
    pair really collides in some signature table, sims match cosine_topk's
    arithmetic for a spot-checked pair."""
    import random

    rng = random.Random(7)
    base = [rng.gauss(0, 1) for _ in range(64)]
    rows = [
        (1, [float(v) for v in base]),
        (2, [float(v + rng.gauss(0, 0.01)) for v in base]),
        (3, [float(rng.gauss(0, 1)) for _ in range(64)]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = similarity.cosine_near_duplicates(emb, threshold=0.9).collect()
    assert all(r["id_a"] < r["id_b"] for r in out)
    assert (1, 2) in {(r["id_a"], r["id_b"]) for r in out}
    for r in out:
        assert r["sim"] >= 0.9


def test_extract_arrow_metrics_match_hof(spark):
    """Arrow metrics tier == hof metric expressions, value for value, on a
    corpus with empty lines, hyphen wraps, dropped pages and multi-page
    docs (the derived sf0.001 span corpus)."""
    from ocrd_odem_spark.plans import pipeline, queries

    docs = queries.docs_nested_df(spark, "/root/testdata/sf0.001")
    cols = ["doc_id", "n_pages", "n_lines_in", "n_lines_out",
            "n_tokens_out", "n_dehyphenated"]
    for dehyph in (False, True):
        hof = {
            r["doc_id"]: tuple(r)
            for r in pipeline.extract(
                docs, dehyphenate=dehyph, with_metrics=True, mode="hof"
            ).select(*cols).collect()
        }
        arrow = {
            r["doc_id"]: tuple(r)
            for r in pipeline.extract(
                docs, dehyphenate=dehyph, with_metrics=True, mode="arrow"
            ).select(*cols).collect()
        }
        assert arrow == hof


def test_ivf_arrow_assignment_matches_literal_ranking(spark):
    """_ranked_cells_arrow == ranked_centroids/F.slice for assignment AND
    probe ranking (ties included: duplicated centroid forces a dot tie)."""
    from pyspark.sql import functions as F

    from ocrd_odem_spark.functions import similarity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in emb.where("vec_id < 3").collect()
    )
    cents.append((3, cents[0][1]))  # duplicate centroid -> exact dot ties
    ranked = similarity.ranked_centroids(F.col("embedding"), cents)
    hof = {
        r["vec_id"]: tuple(r["cids"])
        for r in emb.select(
            "vec_id", F.slice(ranked, 1, 2).alias("cids")
        ).collect()
    }
    fast = {
        r["id"]: tuple(r["cids"])
        for r in similarity._ranked_cells_arrow(
            emb, "vec_id", "embedding", cents, 2
        ).collect()
    }
    assert fast == hof


def test_page_text_stats_arrow_matches_hof(spark):
    """Flat Arrow page-stats tier == the HOF tier, value for value, over
    the derived sf0.001 corpus (empty lines, wraps, sanitize edge chars)."""
    from ocrd_odem_spark.operators.quality import page_text_stats
    from ocrd_odem_spark.plans import queries

    docs = queries.docs_nested_df(spark, "/root/testdata/sf0.001")
    hof = {
        (r["doc_id"], r["media_ref"]): tuple(r)
        for r in page_text_stats(docs).collect()
    }
    arrow = {
        (r["doc_id"], r["media_ref"]): tuple(r)
        for r in page_text_stats(docs, mode="arrow").collect()
    }
    assert arrow == hof


def test_run_pipeline_arrow_matches_hof_chain(spark):
    """Arrow pipeline executor == build_pipeline HOF chain for the q55
    stage list (regex -> chars -> postprocess) over the derived corpus."""
    from ocrd_odem_spark.plans import pipeline, queries

    docs = queries.docs_nested_df(spark, "/root/testdata/sf0.001")
    stages = [
        "sort",
        ("replace_regex", {"pattern": "(J[cdhmn])", "old": "J", "new": "I"}),
        ("replace_chars", {"dict_chars": {"Ic": "Ich", "scan": "Abtastung"}}),
        "postprocess",
        "reoffset",
    ]
    hof = pipeline.to_flat(pipeline.build_pipeline(stages)(docs))
    arrow = pipeline.to_flat(pipeline.run_pipeline_arrow(docs, stages))
    key = lambda r: (r["doc_id"], r["offset"])  # noqa: E731
    assert sorted(map(tuple, arrow.collect()), key=lambda t: (t[0], t[4])) == \
           sorted(map(tuple, hof.collect()), key=lambda t: (t[0], t[4]))


def test_run_pipeline_arrow_rejects_unmirrored(spark):
    from ocrd_odem_spark.plans import pipeline, queries

    docs = queries.docs_nested_df(spark, "/root/testdata/sf0.001")
    import pytest as _pytest

    with _pytest.raises(KeyError):
        pipeline.run_pipeline_arrow(docs, ["sort", "dehyphenate"])
    with _pytest.raises(KeyError):
        pipeline.run_pipeline_arrow(docs, ["nope"])


def test_extract_arrow_boundary_edge_shapes(spark):
    """r6.2 mapInArrow boundary: flat-columnar in/out must survive the
    degenerate list shapes the dict-per-span form handled implicitly —
    empty span arrays, media-only docs, null text cells, unsorted
    offsets, and a batch whose every doc is empty."""
    from ocrd_odem_spark.plans import pipeline
    from ocrd_odem_spark.schema import DOCS_SCHEMA

    rows = [
        ("empty", []),
        ("media_only", [("media", "", "00000001", 0)]),
        ("null_text", [("text", None, "00000001", 2),
                       ("media", "", "00000001", 0)]),
        ("unsorted", [("text", "zwei- ", "00000001", 3),
                      ("text", "teilig hier", "00000001", 4),
                      ("media", "", "00000001", 0)]),
        ("plain", [("media", "", "00000001", 0),
                   ("text", "ein wort ...", "00000001", 1)]),
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    for dehyph in (False, True):
        hof = {
            r["doc_id"]: [tuple(s) for s in r["spans"]]
            for r in pipeline.extract(docs, dehyphenate=dehyph, mode="hof").collect()
        }
        arrow = {
            r["doc_id"]: [tuple(s) for s in r["spans"]]
            for r in pipeline.extract(
                docs, dehyphenate=dehyph, mode="arrow"
            ).collect()
        }
        assert arrow == hof
