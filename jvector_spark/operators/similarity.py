"""Similarity search over an embedding column (array<float>) — the direct
descendant of the reference's core capability (ANN top-k,
GraphSearcher.java:209-230), re-expressed Spark-first.

- ``cosine_topk``: exact brute-force scan — all math in JVM expressions
  (zip_with dot product folded in float64), global top-k via window. This
  is the ground-truth path, like jvector's exact-similarity rerank tier.
- ``cosine_topk_lsh``: the scale path — random-hyperplane LSH bucketing
  (signs of dot products with R fixed seeded hyperplanes); candidates are
  restricted to the query's bucket (± multi-probe neighbors at Hamming
  distance 1), then scored exactly. Approximate (recall < 1) but turns a
  full scan into a bucket lookup — the graft of jvector's graph traversal
  visiting a tiny fraction of the corpus.

Hyperplanes are generated from a fixed seed so results are deterministic
across runs (the reference's randomizedtesting-with-fixed-seed idiom).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    """float64 dot product of two array columns, JVM-side."""
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


def cosine_scores(
    embeddings: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cos) for every row — exact, codegen'd, no UDF."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    return embeddings.select(
        F.col(id_col),
        (_dot(F.col(vec_col), q) / (F.lit(qn) * _norm(F.col(vec_col)))).alias("cos"),
    )


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(rank, vec_id, cos): exact top-k by cosine, ties → ascending id
    (same determinism contract as BM25 top-k)."""
    scored = cosine_scores(embeddings, query_vec, id_col, vec_col)
    w = Window.orderBy(F.desc("cos"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("rank", id_col, "cos")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 1234) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """int bucket id: bit r = sign(v · plane_r)."""
    acc = F.lit(0).cast("long")
    for r, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(_dot(vec_col, p) > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = acc + F.shiftleft(bit, r)
    return acc


def cosine_topk_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 6,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1234,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's hyperplane
    bucket (plus Hamming-1 probe buckets). At cluster scale the bucket
    column is a partition key, so a query touches 1+R partitions instead of
    the corpus — the IVF/LSH analog of graph search visiting few nodes."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, n_planes, seed)
    q = np.asarray(query_vec, dtype=np.float64)
    qbits = int(sum(1 << r for r, p in enumerate(planes) if float(p @ q) > 0))
    probes = [qbits] + ([qbits ^ (1 << r) for r in range(n_planes)] if multiprobe else [])
    bucketed = embeddings.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
