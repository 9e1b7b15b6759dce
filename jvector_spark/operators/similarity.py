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
    (same determinism contract as BM25 top-k).

    ``orderBy().limit(k)`` compiles to TakeOrderedAndProject — every
    partition keeps a local k-heap and only k rows per partition reach the
    driver-side merge, so this scans 10^12 rows without a global sort. The
    rank window then runs over ≤ k rows (a single tiny partition by
    construction, not a scale hazard)."""
    scored = cosine_scores(embeddings, query_vec, id_col, vec_col)
    top = scored.orderBy(F.desc("cos"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("cos"), F.asc(id_col))
    return (
        top.withColumn("rank", F.row_number().over(w))
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
    probes = [qbits]
    if multiprobe:
        # Hamming-1 AND Hamming-2 probes: near neighbors that disagree with
        # the query on up to two hyperplanes are still found — the overquery
        # knob of the reference's search grid (Bench.java:47-52); with R=6
        # this scans 22 of 64 buckets instead of the whole corpus
        probes += [qbits ^ (1 << r) for r in range(n_planes)]
        probes += [
            qbits ^ (1 << r) ^ (1 << s)
            for r in range(n_planes)
            for s in range(r + 1, n_planes)
        ]
    bucketed = embeddings.withColumn("_bucket", lsh_bucket_col(F.col(vec_col), planes))
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def _normalized(embeddings: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, _nv): L2-normalized float64 vectors — cosine becomes a dot."""
    return embeddings.select(
        F.col(id_col),
        F.transform(
            F.col(vec_col),
            lambda x: x.cast("double") / F.sqrt(
                F.aggregate(
                    F.transform(F.col(vec_col), lambda y: y.cast("double") * y.cast("double")),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ),
        ).alias("_nv"),
    )


def _pair_cos_col() -> Column:
    return F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def embedding_near_dups(
    embeddings: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(a, b, cos) for every pair with cosine ≥ threshold, a < b — the
    embedding-space near-duplicate detector (exact tier).

    This is the *verification-scale* path: an all-pairs join. It is correct
    at any scale but O(N²) — at 100 TB you run ``embedding_near_dups_lsh``
    to generate candidates and this only on the candidates. Normalizing
    first means the join condition is a plain dot product.
    """
    normed = _normalized(embeddings, id_col, vec_col)
    a = normed.select(F.col(id_col).alias("a"), F.col("_nv").alias("_va"))
    b = normed.select(F.col(id_col).alias("b"), F.col("_nv").alias("_vb"))
    return (
        a.join(b, F.col("a") < F.col("b"))
        .withColumn("cos", _pair_cos_col())
        .filter(F.col("cos") >= F.lit(float(threshold)))
        .select("a", "b", "cos")
    )


def embedding_near_dups_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 1234,
) -> DataFrame:
    """(a, b, cos) near-dup pairs via hyperplane-LSH blocking: candidates
    must share a bucket (high-cosine pairs almost always do — collision
    P = (1 - θ/π)^R), then exact-verified. The LSH equi-join replaces the
    O(N²) cross join with a shuffle on bucket keys — the same
    candidates-then-verify shape as minhash_near_dups and the reference's
    approx-then-rerank search (GraphSearcher.java:451-487). Approximate:
    recall < 1 by construction (pairs split by every hyperplane are missed);
    measured against the exact tier in tests."""
    # dim from one row (driver-side peek is O(1))
    first = embeddings.select(vec_col).head()
    if first is None:
        return embedding_near_dups(embeddings.limit(0), threshold, id_col, vec_col)
    planes = _hyperplanes(len(first[0]), n_planes, seed)
    normed = _normalized(embeddings, id_col, vec_col).withColumn(
        "_bucket", lsh_bucket_col(F.col("_nv"), planes)
    )
    a = normed.select(F.col(id_col).alias("a"), F.col("_nv").alias("_va"), "_bucket")
    b = normed.select(F.col(id_col).alias("b"), F.col("_nv").alias("_vb"), "_bucket")
    # candidates = bucket-equi-join (shuffle on bucket key, not a cross
    # join); exact cosine verified on the candidate pairs ONLY
    return (
        a.join(b, "_bucket")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", _pair_cos_col())
        .filter(F.col("cos") >= F.lit(float(threshold)))
        # no distinct needed: each vector lives in exactly one bucket, so a
        # pair is generated at most once
        .select("a", "b", "cos")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the k-means codebook analog
# ---------------------------------------------------------------------------

IVF_MAX_TRAINING = 131_072  # reference: MAX_PQ_TRAINING_SET_SIZE = 128k
                            # (quantization/ProductQuantization.java:67)


def ivf_train(
    embeddings: DataFrame,
    n_clusters: int = 16,
    n_iters: int = 10,
    sample_size: int = IVF_MAX_TRAINING,
    seed: int = 77,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic spherical k-means over a bounded training sample —
    the coarse-quantizer twin of the reference's PQ codebook training
    (k-means++ init + Lloyd iterations, capped training set;
    quantization/KMeansPlusPlusClusterer.java:1-450,
    ProductQuantization.java:88-154). Returns L2-normalized centroids
    (n_clusters × dim, float64).

    The sample is the lowest ``sample_size`` ids (TakeOrderedAndProject —
    no global sort), so training is reproducible at any corpus size."""
    pdf = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(int(sample_size))
        .toPandas()
    )
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    n = len(X)
    k = min(n_clusters, n)
    rng = np.random.default_rng(seed)

    # k-means++ seeding (distance = 1 - cos on the unit sphere)
    centroids = np.empty((k, X.shape[1]))
    centroids[0] = X[int(rng.integers(n))]
    d2 = 1.0 - X @ centroids[0]
    for j in range(1, k):
        p = np.maximum(d2, 0)
        s = p.sum()
        idx = int(rng.choice(n, p=p / s)) if s > 0 else int(rng.integers(n))
        centroids[j] = X[idx]
        d2 = np.minimum(d2, 1.0 - X @ centroids[j])

    for _ in range(n_iters):
        assign = np.argmax(X @ centroids.T, axis=1)
        for j in range(k):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                centroids[j] = c / max(np.linalg.norm(c), 1e-12)
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster) — nearest-centroid assignment, Arrow-vectorized
    (whole-batch ``X @ C.T`` argmax; the bulk-ADC shape of Q14). At cluster
    scale this relation is written ``partitionBy(cluster)`` so a probe scans
    only its clusters' files (partition pruning)."""
    import pandas as pd

    C = np.ascontiguousarray(centroids, dtype=np.float64)

    def fn(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].to_numpy(),
                    "cluster": np.argmax(X @ C.T, axis=1).astype(np.int32),
                }
            )

    return embeddings.select(id_col, vec_col).mapInPandas(
        fn, schema=f"{id_col} long, cluster int"
    )


def ivf_topk(
    embeddings: DataFrame,
    centroids: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
    assignments: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only the ``n_probe`` clusters nearest the
    query (IVF probe — the analog of the graph search visiting a small
    neighborhood). ``n_probe == n_clusters`` degrades gracefully to the
    exact scan (tested identical to ``cosine_topk``)."""
    C = np.ascontiguousarray(centroids, dtype=np.float64)
    q = np.asarray(query_vec, dtype=np.float64)
    q /= max(np.linalg.norm(q), 1e-12)
    probes = [int(c) for c in np.argsort(-(C @ q), kind="stable")[: int(n_probe)]]
    if assignments is None:
        assignments = ivf_assign(embeddings, centroids, id_col, vec_col)
    cand_ids = assignments.filter(F.col("cluster").isin(probes)).select(id_col)
    cand = embeddings.join(cand_ids, id_col)
    return cosine_topk(cand, query_vec, k, id_col, vec_col)
