"""Proximity (NEAR/slop), prefix-wildcard, and conversation-level ranking:
index-backed paths must equal their brute-force twins exactly.

Same cross-check strategy as the phrase suite — the reference's
fast-vs-slow idiom (exact brute force as ground truth,
TestVectorGraph.java:626-673) applied to three more query types."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def prox_index_dir(tmp_path_factory, corpus):
    from jvector_spark.index.build import build_index
    from jvector_spark.index.positions import add_positions

    d = str(tmp_path_factory.mktemp("proxidx"))
    build_index(
        corpus, d, salt_threshold=64, target_salt_postings=64, n_parts=4,
        doc_map_cols=["conv_id"],
    )
    add_positions(corpus, d)
    return d


def _common_pair(spark, corpus):
    """Two distinct terms that co-occur in many docs."""
    from jvector_spark.operators.phrase import token_positions

    top = (
        token_positions(corpus)
        .groupBy("term")
        .count()
        .orderBy(F.desc("count"), "term")
        .limit(2)
        .collect()
    )
    return top[0].term, top[1].term


@pytest.mark.parametrize("slop,ordered", [(1, True), (3, False), (5, True), (8, False)])
def test_proximity_indexed_equals_bruteforce(spark, corpus, prox_index_dir, slop, ordered):
    from jvector_spark.index.positions import proximity_count_indexed
    from jvector_spark.operators.phrase import proximity_count

    t1, t2 = _common_pair(spark, corpus)
    want = sorted(
        tuple(r)
        for r in proximity_count(
            corpus, t1, t2, slop=slop, ordered=ordered
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in proximity_count_indexed(
            spark, prox_index_dir, t1, t2, slop=slop, ordered=ordered
        ).collect()
    )
    assert want, "fixture pair must co-occur"
    assert got == want


def test_proximity_ordered_slop1_is_phrase(spark, corpus, prox_index_dir):
    """ordered slop=1 degenerates to the 2-term exact phrase count."""
    from jvector_spark.index.positions import proximity_count_indexed
    from jvector_spark.operators.phrase import phrase_count

    t1, t2 = _common_pair(spark, corpus)
    want = sorted(
        (r.doc_id, r.n_phrase) for r in phrase_count(corpus, t1, t2).collect()
    )
    got = sorted(
        tuple(r)
        for r in proximity_count_indexed(
            spark, prox_index_dir, t1, t2, slop=1, ordered=True
        ).collect()
    )
    assert got == want


def test_proximity_oov_term_empty(spark, corpus, prox_index_dir):
    from jvector_spark.index.positions import proximity_count_indexed

    t1, _ = _common_pair(spark, corpus)
    assert proximity_count_indexed(
        spark, prox_index_dir, t1, "zzznope"
    ).count() == 0


def test_proximity_same_term_rejected(spark, corpus):
    from jvector_spark.operators.phrase import proximity_count

    with pytest.raises(ValueError):
        proximity_count(corpus, "a", "a")


def test_prefix_topk_indexed_equals_bruteforce(spark, corpus, prox_index_dir):
    from jvector_spark.index.query import bm25_topk_prefix
    from jvector_spark.operators.topk import prefix_topk_bruteforce

    t1, _ = _common_pair(spark, corpus)
    prefix = t1[:2]
    want = [
        (r.rank, r.doc_id, round(r.score, 9))
        for r in prefix_topk_bruteforce(corpus, prefix, k=10)
        .orderBy("rank")
        .collect()
    ]
    got = [
        (r.rank, r.doc_id, round(r.score, 9))
        for r in bm25_topk_prefix(spark, prox_index_dir, prefix, k=10)
        .orderBy("rank")
        .collect()
    ]
    assert want, "prefix must expand to at least one term"
    assert got == want


def test_prefix_topk_no_match_empty(spark, prox_index_dir):
    from jvector_spark.index.query import bm25_topk_prefix

    assert bm25_topk_prefix(spark, prox_index_dir, "zzznope").count() == 0


def test_conv_topk_indexed_equals_bruteforce(spark, corpus, prox_index_dir, query_set):
    from jvector_spark.operators.conversation import conv_topk, conv_topk_indexed
    from jvector_spark.operators.topk import queries_df

    qterms = queries_df(
        spark,
        [(r.query_id, list(r.terms)) for r in query_set.head(12).itertuples(index=False)],
    )
    want = [
        (r.query_id, r.rank, r.conv_id, round(r.score, 9))
        for r in conv_topk(corpus, qterms, k=5)
        .orderBy("query_id", "rank")
        .collect()
    ]
    got = [
        (r.query_id, r.rank, r.conv_id, round(r.score, 9))
        for r in conv_topk_indexed(spark, prox_index_dir, qterms, k=5)
        .orderBy("query_id", "rank")
        .collect()
    ]
    assert want, "query set must match some conversations"
    assert got == want


def test_conv_topk_group_score_is_best_turn(spark, corpus, query_set):
    """A group's score equals the max turn score within it."""
    from jvector_spark.operators.conversation import conv_topk
    from jvector_spark.operators.topk import bm25_score_all, queries_df

    qterms = queries_df(
        spark,
        [(r.query_id, list(r.terms)) for r in query_set.head(3).itertuples(index=False)],
    )
    turn = bm25_score_all(corpus, qterms).alias("s")
    best = (
        turn.join(corpus.select("doc_id", "conv_id"), "doc_id")
        .groupBy("query_id", "conv_id")
        .agg(F.max("score").alias("want"))
    )
    got = conv_topk(corpus, qterms, k=3)
    j = got.join(best, ["query_id", "conv_id"]).collect()
    assert len(j) == got.count()
    assert all(abs(r.score - r.want) < 1e-12 for r in j)
