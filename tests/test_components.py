"""Near-dup connected components (`dedup.neardup_components`) vs a
pure-Python union-find oracle, plus a DuckDB recursive-CTE cross-check
and the keep-canonical annotation step."""

from __future__ import annotations

import duckdb
import pytest

from ocrd_odem_spark.functions import dedup


def _uf_components(pairs):
    """Union-find ground truth: node -> min reachable id."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, pairs, max_rounds=25):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        r["node"]: r["component"]
        for r in dedup.neardup_components(df, max_rounds=max_rounds).collect()
    }
    assert got == _uf_components(pairs)
    return got


def test_two_triangles_bridge(spark):
    # two triangles joined by one bridge -> single component, min id wins
    pairs = [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (3, 10)]
    got = _run(spark, pairs)
    assert set(got.values()) == {1}


def test_disjoint_groups(spark):
    pairs = [(5, 9), (9, 7), (20, 21), (30, 31), (31, 32), (32, 30)]
    got = _run(spark, pairs)
    assert got[7] == 5 and got[21] == 20 and got[32] == 30


def test_chain_pointer_jumping(spark):
    """A 64-node chain is the O(diameter) worst case for naive
    propagation; pointer jumping must resolve it in <= ~log2 rounds."""
    pairs = [(i, i + 1) for i in range(63)]
    got = _run(spark, pairs, max_rounds=10)  # naive would need 63
    assert set(got.values()) == {0}
    assert len(got) == 64


def test_random_graph_vs_union_find(spark):
    import random

    rng = random.Random(42)
    pairs = [
        (rng.randrange(120), rng.randrange(120)) for _ in range(90)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    _run(spark, pairs)


def test_string_ids(spark):
    pairs = [("doc-b", "doc-a"), ("doc-c", "doc-b"), ("doc-x", "doc-y")]
    df = spark.createDataFrame(pairs, "id_a string, id_b string")
    got = {
        r["node"]: r["component"]
        for r in dedup.neardup_components(df).collect()
    }
    assert got == {
        "doc-a": "doc-a", "doc-b": "doc-a", "doc-c": "doc-a",
        "doc-x": "doc-x", "doc-y": "doc-x",
    }


def test_duckdb_recursive_cte_oracle(spark):
    """Cross-engine check: DuckDB computes the same components through a
    recursive CTE (min reachable id via symmetric closure)."""
    pairs = [(1, 2), (2, 3), (7, 8), (9, 8), (4, 1)]
    got = _run(spark, pairs)
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE edges AS SELECT * FROM (VALUES "
        + ", ".join(f"({a}, {b})" for a, b in pairs)
        + ") t(a, b)"
    )
    rows = con.execute("""
        WITH RECURSIVE sym AS (
          SELECT a, b FROM edges UNION SELECT b, a FROM edges
        ), reach(node, label) AS (
          SELECT a, a FROM sym
          UNION
          SELECT s.b, r.label FROM reach r JOIN sym s ON s.a = r.node
        )
        SELECT node, min(label) FROM reach GROUP BY node
    """).fetchall()
    assert {n: l for n, l in rows} == got


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(0, 3), (3, 5)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["component"], r["is_duplicate"])
        for r in dedup.dedup_keep_canonical(docs, pairs).collect()
    }
    assert got == {
        0: (0, False), 1: (1, False), 2: (2, False),
        3: (0, True), 4: (4, False), 5: (0, True),
    }
    # survivors = one per component
    keep = [d for d, (_, dup) in got.items() if not dup]
    assert sorted(keep) == [0, 1, 2, 4]


def test_lsh_pipeline_end_to_end(spark):
    """LSH candidates from the documents table feed components: every
    candidate pair lands in one component with its transitive closure."""
    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    cand = dedup.minhash_lsh_candidates(
        docs, id_col="doc_id", text_col="text"
    ).select("id_a", "id_b")
    pairs = [(r["id_a"], r["id_b"]) for r in cand.collect()]
    if not pairs:
        pytest.skip("no candidate pairs at this scale")
    comp = {
        r["node"]: r["component"]
        for r in dedup.neardup_components(cand).collect()
    }
    assert comp == _uf_components(pairs)
