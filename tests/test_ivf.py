"""IVF ANN tests: deterministic training, full-probe == exact scan,
probe-recall floor, Arrow-vectorized assignment.

Analog of the reference's PQ/codebook tests: deterministic k-means training
on a capped sample (TestProductQuantization.java:56-133) and
recall-vs-exact assertions (TestVectorGraph.java:626-673)."""

from __future__ import annotations

import numpy as np
import pytest


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def centroids(embeddings):
    from jvector_spark.operators.similarity import ivf_train

    return ivf_train(embeddings, n_clusters=8, n_iters=6, seed=77)


def test_training_is_deterministic(embeddings):
    from jvector_spark.operators.similarity import ivf_train

    a = ivf_train(embeddings, n_clusters=8, n_iters=6, seed=77)
    b = ivf_train(embeddings, n_clusters=8, n_iters=6, seed=77)
    assert np.array_equal(a, b)
    assert np.allclose(np.linalg.norm(a, axis=1), 1.0)


def test_assignment_covers_all_vectors(spark, embeddings, centroids):
    from jvector_spark.operators.similarity import ivf_assign

    assigns = ivf_assign(embeddings, centroids)
    n = embeddings.count()
    assert assigns.count() == n
    clusters = {r.cluster for r in assigns.select("cluster").distinct().collect()}
    assert clusters <= set(range(len(centroids)))
    assert len(clusters) > 1  # training actually split the space


def test_full_probe_equals_exact(spark, embeddings, centroids):
    from pyspark.sql import functions as F

    from jvector_spark.operators.similarity import cosine_topk, ivf_topk

    qv = list(
        embeddings.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    )
    base = embeddings.filter(F.col("vec_id") != 0)
    want = [
        (r.rank, r.vec_id, round(r.cos, 9))
        for r in cosine_topk(base, qv, k=10).collect()
    ]
    got = [
        (r.rank, r.vec_id, round(r.cos, 9))
        for r in ivf_topk(base, centroids, qv, k=10, n_probe=len(centroids)).collect()
    ]
    assert got == want


def test_probe_recall_floor(spark, embeddings, centroids):
    """recall@10 over several query vectors with n_probe=3 of 8 — the IVF
    probe must land most true neighbors (analog of the reference's
    recall > 0.9 randomized floor; looser here: tiny corpus, hard floor)."""
    from pyspark.sql import functions as F

    from jvector_spark.operators.similarity import cosine_topk, ivf_assign, ivf_topk

    assigns = ivf_assign(embeddings, centroids).cache()
    recalls = []
    for qid in [0, 5, 11]:
        qv = list(
            embeddings.filter(F.col("vec_id") == qid).select("embedding").first()[0]
        )
        base = embeddings.filter(F.col("vec_id") != qid)
        want = {r.vec_id for r in cosine_topk(base, qv, k=10).collect()}
        got = {
            r.vec_id
            for r in ivf_topk(
                base, centroids, qv, k=10, n_probe=3, assignments=assigns
            ).collect()
        }
        recalls.append(len(want & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls
