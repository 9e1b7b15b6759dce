"""Positional-postings feature tests: occurrence round-trip, index-level
phrase counts == brute force, n-term phrases, absent-term behavior.

Analog of the reference's feature round-trip suite (inline features write →
load → identical search, TestOnDiskGraphIndex.java:77-464) applied to the
positions feature."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pos_index_dir(tmp_path_factory, corpus):
    from jvector_spark.index.build import build_index
    from jvector_spark.index.positions import add_positions

    d = str(tmp_path_factory.mktemp("posidx"))
    build_index(corpus, d, salt_threshold=64, target_salt_postings=64, n_parts=4)
    m = add_positions(corpus, d)
    assert m["occurrences"] > 0
    return d


def test_positions_roundtrip(spark, corpus, pos_index_dir):
    from jvector_spark.index.positions import decode_positions
    from jvector_spark.index.storage import read_table
    from jvector_spark.operators.phrase import token_positions

    dct = read_table(spark, pos_index_dir, "dictionary")
    want = (
        token_positions(corpus)
        .join(dct.select("term", "term_id"), "term")
        .select("term_id", "doc_id", "pos")
        .orderBy("term_id", "doc_id", "pos")
        .collect()
    )
    got = (
        decode_positions(spark, pos_index_dir)
        .orderBy("term_id", "doc_id", "pos")
        .collect()
    )
    assert len(got) == len(want)
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_pruned_decode_restricts_terms(spark, pos_index_dir):
    from jvector_spark.index.positions import decode_positions

    got = decode_positions(spark, pos_index_dir, term_ids=[3, 7])
    assert {r.term_id for r in got.select("term_id").distinct().collect()} <= {3, 7}


def _top_bigram(spark, corpus):
    """Most frequent adjacent pair in the corpus — guarantees matches."""
    from jvector_spark.operators.phrase import token_positions

    pos = token_positions(corpus)
    a = pos.select("doc_id", F.col("pos").alias("p"), F.col("term").alias("t1"))
    b = pos.select("doc_id", (F.col("pos") - 1).alias("p"), F.col("term").alias("t2"))
    return (
        a.join(b, ["doc_id", "p"])
        .groupBy("t1", "t2")
        .count()
        .orderBy(F.desc("count"), "t1", "t2")
        .first()
    )


def test_phrase_count_indexed_equals_bruteforce(spark, corpus, pos_index_dir):
    from jvector_spark.index.positions import phrase_count_indexed
    from jvector_spark.operators.phrase import phrase_count

    big = _top_bigram(spark, corpus)
    t1, t2 = big.t1, big.t2
    want = sorted(
        (r.doc_id, r.n_phrase) for r in phrase_count(corpus, t1, t2).collect()
    )
    got = sorted(
        (r.doc_id, r.n_phrase)
        for r in phrase_count_indexed(spark, pos_index_dir, t1, t2).collect()
    )
    assert want and got == want


def test_three_term_phrase(spark, corpus, pos_index_dir):
    from jvector_spark.index.positions import phrase_count_indexed
    from jvector_spark.operators.phrase import token_positions

    # derive ground truth for a trigram via the positional relation
    pos = token_positions(corpus)
    tri = (
        pos.alias("a")
        .join(pos.alias("b"), ["doc_id"])
        .join(pos.alias("c"), ["doc_id"])
        .filter(
            (F.col("b.pos") == F.col("a.pos") + 1)
            & (F.col("c.pos") == F.col("a.pos") + 2)
        )
        .groupBy("a.term", "b.term", "c.term")
        .count()
        .orderBy(F.desc("count"))
        .first()
    )
    terms = [tri[0], tri[1], tri[2]]
    want = sorted(
        (r.doc_id, r.n)
        for r in pos.alias("a")
        .join(pos.alias("b"), ["doc_id"])
        .join(pos.alias("c"), ["doc_id"])
        .filter(
            (F.col("a.term") == terms[0])
            & (F.col("b.term") == terms[1])
            & (F.col("c.term") == terms[2])
            & (F.col("b.pos") == F.col("a.pos") + 1)
            & (F.col("c.pos") == F.col("a.pos") + 2)
        )
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n"))
        .collect()
    )
    got = sorted(
        (r.doc_id, r.n_phrase)
        for r in phrase_count_indexed(spark, pos_index_dir, *terms).collect()
    )
    assert want and got == want


def test_absent_term_returns_empty(spark, pos_index_dir):
    from jvector_spark.index.positions import phrase_count_indexed

    assert (
        phrase_count_indexed(spark, pos_index_dir, "zzznope", "t0001").count() == 0
    )


def test_positionless_index_raises(spark, corpus, tmp_path):
    from jvector_spark.index.build import build_index
    from jvector_spark.index.positions import has_positions, phrase_count_indexed

    d = str(tmp_path / "noposidx")
    build_index(corpus.limit(200), d, n_parts=2)
    assert not has_positions(d)
    with pytest.raises(ValueError):
        phrase_count_indexed(spark, d, "t0001", "t0002")
