"""Approximate-nearest-neighbour search over embedding columns.

* ``cosine_topk``      — exact brute-force baseline: broadcast the query
  set, score with a JVM-side ``aggregate(zip_with(...))`` dot product,
  rank with a window.  Right for <= ~10^5 queries against any corpus size
  (corpus never shuffles; one pass, partial top-k via window per query).
* ``lsh_cosine_topk``  — scale path: random-hyperplane signatures bucket
  the corpus; per-bucket candidates only.  Hyperplanes are deterministic
  (seeded), so signatures are reproducible across runs/executors.

Vectors stay ``array<float>`` end to end; all arithmetic happens in
whole-plan JVM expressions (no Python per row).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window, functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, sim, rank); excludes self-match.

    Ranking key is (round(sim, 6) DESC, neighbor_id) — fully deterministic
    even under floating-point summation-order differences.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))
    scored = c.crossJoin(F.broadcast(q)).where(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_cv"), F.col("_qv")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("int"))
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit-free hyperplanes (driver-side)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def rh_signature(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane sign signature packed into a long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(v)) for v in plane])
        bit = F.when(_dot(vec, plane_col) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig + bit
    return sig


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_tables: int = 8,
    dim: int = 64,
    seed: int = 42,
) -> DataFrame:
    """Bucketed ANN with OR-construction: ``n_tables`` independent
    sign-signature tables; a candidate pair needs a full match in ANY
    table.  Recall dial = (n_planes down, n_tables up); cost dial = the
    reverse.  Same output shape as ``cosine_topk`` but approximate."""
    tables = [hyperplanes(dim, n_planes, seed + 1000 * t) for t in range(n_tables)]

    def with_buckets(df: DataFrame, idc: str, alias: str) -> DataFrame:
        sigs = F.array(
            *[
                F.struct(
                    F.lit(t).alias("t"),
                    rh_signature(F.col(vec_col), planes).alias("sig"),
                )
                for t, planes in enumerate(tables)
            ]
        )
        return df.select(
            F.col(id_col).alias(idc),
            F.col(vec_col).alias(alias),
            F.explode(sigs).alias("_b"),
        ).select(idc, alias, "_b.t", "_b.sig")

    c = with_buckets(corpus, "neighbor_id", "_cv")
    q = with_buckets(queries, "query_id", "_qv")
    scored = c.join(F.broadcast(q), ["t", "sig"]).where(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("_cv"), F.col("_qv")), 6).alias("sim"),
    ).distinct()
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", F.col("rank").cast("int"))
    )
