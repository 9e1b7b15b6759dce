"""Doc-partitioned index tests: results identical to the term-partitioned
engine AND the brute-force oracle (pruned + unpruned), buckets actually
partition the doc space, decode parity.

The layout is the multi-index search shape surveyed as Q10 — per-segment
top-k then rerankFloor merge (GraphSearcher.java:196-201,368-386)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def dp_index(tmp_path_factory, corpus):
    from jvector_spark.index.docpart import build_doc_partitioned

    d = str(tmp_path_factory.mktemp("dpidx"))
    m = build_doc_partitioned(
        corpus, d, doc_map_cols=["conv_id", "turn_idx"], n_buckets=8
    )
    assert m["postings_emitted"] > 0
    return d


def test_buckets_partition_doc_space(spark, corpus, dp_index):
    from jvector_spark.index.storage import read_segments, read_table

    seg = read_segments(spark, dp_index)
    assert seg["layout"] == "doc"
    w = int(seg["bucket_width"])
    p = read_table(spark, dp_index, "postings")
    bad = p.filter(
        (F.col("base") < F.col("part_id") * w)
        | (F.col("max_doc_id") >= (F.col("part_id") + 1) * w)
    ).count()
    assert bad == 0, "posting blocks must not straddle bucket boundaries"
    assert p.select("part_id").distinct().count() > 1


def test_docpart_topk_equals_bruteforce_and_termpart(
    spark, corpus, dp_index, query_set, tmp_path_factory
):
    from jvector_spark.index.build import build_index
    from jvector_spark.index.docpart import bm25_topk_docpart
    from jvector_spark.index.query import bm25_topk_indexed
    from jvector_spark.operators.topk import bm25_topk_bruteforce, queries_df

    qdf = queries_df(
        spark,
        list(zip(query_set["query_id"][:15], [list(t) for t in query_set["terms"][:15]])),
    )
    want = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9))
        for r in bm25_topk_bruteforce(corpus, qdf, k=10).collect()
    )
    for prune in (True, False):
        got = sorted(
            (r.query_id, r.rank, r.doc_id, round(r.score, 9))
            for r in bm25_topk_docpart(spark, dp_index, qdf, k=10, prune=prune).collect()
        )
        assert got == want, f"prune={prune}"

    tp = str(tmp_path_factory.mktemp("tpidx"))
    build_index(corpus, tp, n_parts=4, checkpointed=False)
    tp_rows = sorted(
        (r.query_id, r.rank, r.doc_id, round(r.score, 9))
        for r in bm25_topk_indexed(spark, tp, qdf, k=10).collect()
    )
    assert tp_rows == want


def test_docpart_decode_parity(spark, corpus, dp_index):
    from jvector_spark.index.query import decode_postings
    from jvector_spark.index.storage import read_table
    from jvector_spark.operators import dictionary, term_freq

    tf = term_freq(corpus)
    dct = read_table(spark, dp_index, "dictionary")
    want = (
        tf.join(dct.select("term", "term_id"), "term")
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("tf").alias("s"))
        .collect()[0]
    )
    got = (
        decode_postings(spark, dp_index)
        .groupBy()
        .agg(F.count("*").alias("n"), F.sum("tf").alias("s"))
        .collect()[0]
    )
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_docpart_rejects_wrong_layout(spark, corpus, tmp_path):
    from jvector_spark.index.build import build_index
    from jvector_spark.index.docpart import bm25_topk_docpart
    from jvector_spark.operators.topk import queries_df

    d = str(tmp_path / "tp")
    build_index(corpus.limit(300), d, n_parts=2, checkpointed=False)
    with pytest.raises(ValueError):
        bm25_topk_docpart(spark, d, queries_df(spark, [(0, ["t0001"])]), k=5)


def test_empty_and_unknown_queries(spark, dp_index):
    from jvector_spark.index.docpart import bm25_topk_docpart
    from jvector_spark.operators.topk import queries_df

    q = queries_df(spark, [(0, ["zzznope"]), (1, [])])
    assert bm25_topk_docpart(spark, dp_index, q, k=5).count() == 0
