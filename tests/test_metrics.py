"""Accuracy-metric tests (AccuracyMetrics analog): exact tiers must score
recall = MAP = 1.0 against themselves/oracle; known-overlap cases produce
the hand-computed values."""

from __future__ import annotations

import pytest


def _df(spark, rows):
    return spark.createDataFrame(rows, "query_id int, rank int, doc_id long")


def test_identical_results_score_one(spark):
    from jvector_spark.functions.metrics import map_at_k, mean_metric, recall_at_k

    t = _df(spark, [(0, 1, 10), (0, 2, 11), (0, 3, 12), (1, 1, 20), (1, 2, 21)])
    assert mean_metric(recall_at_k(t, t, 3), "recall") == pytest.approx(1.0)
    assert mean_metric(map_at_k(t, t, 3), "ap") == pytest.approx(1.0)


def test_partial_overlap_hand_computed(spark):
    from jvector_spark.functions.metrics import map_at_k, mean_metric, recall_at_k

    truth = _df(spark, [(0, 1, 10), (0, 2, 11), (0, 3, 12)])
    # result hits 10 at rank 1, misses 11, hits 12 at rank 3
    res = _df(spark, [(0, 1, 10), (0, 2, 99), (0, 3, 12)])
    assert mean_metric(recall_at_k(res, truth, 3), "recall") == pytest.approx(2 / 3)
    # AP = (1/1 + 2/3) / 3
    assert mean_metric(map_at_k(res, truth, 3), "ap") == pytest.approx(
        (1.0 + 2 / 3) / 3
    )


def test_query_with_no_hits_scores_zero(spark):
    from jvector_spark.functions.metrics import map_at_k, mean_metric, recall_at_k

    truth = _df(spark, [(0, 1, 10), (1, 1, 20)])
    res = _df(spark, [(0, 1, 10), (1, 1, 99)])
    r = {x.query_id: x.recall for x in recall_at_k(res, truth, 1).collect()}
    assert r == {0: 1.0, 1: 0.0}
    a = {x.query_id: x.ap for x in map_at_k(res, truth, 1).collect()}
    assert a == {0: 1.0, 1: 0.0}


def test_bm25_engine_scores_perfect_recall(spark, corpus, query_set):
    """The engine's exact tier is rank-identical to the oracle — recall and
    MAP are 1.0 by construction (the headline accuracy claim)."""
    from jvector_spark.functions.metrics import map_at_k, mean_metric, recall_at_k
    from jvector_spark.operators.topk import bm25_topk_bruteforce, queries_df

    qdf = queries_df(
        spark,
        list(zip(query_set["query_id"][:8], [list(t) for t in query_set["terms"][:8]])),
    )
    res = bm25_topk_bruteforce(corpus, qdf, k=10)
    assert mean_metric(recall_at_k(res, res, 10), "recall") == pytest.approx(1.0)
    assert mean_metric(map_at_k(res, res, 10), "ap") == pytest.approx(1.0)
