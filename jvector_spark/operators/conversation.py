"""Conversation-level ranking: aggregate turn-level BM25 relevance up to
the conversation (or any grouping column) and rank the groups.

The transcripts data model is multi-turn — (conv_id, turn_idx) — and the
question a transcripts user actually asks is "which CONVERSATIONS are about
X", not "which turns". The group score is the best turn's score
(max-aggregation, the classic best-passage retrieval rule: document score =
max over passages), which also sidesteps float summation-order jitter in
cross-engine comparison.

Reference analog: jvector's multi-index search merges per-shard top-k by
score into one result (rerankFloor merge, GraphSearcher.java:368-386); here
the "shards" are a conversation's turns and the merge keeps the best one.

Both paths return (query_id, rank, <group>, score):
- :func:`conv_topk` — brute force over the raw corpus;
- :func:`conv_topk_indexed` — score matched turns from the inverted index
  (decode only the queried terms' posting blocks) and map doc_id back to
  its group through the index's ``doc_map`` table (built with
  ``doc_map_cols=[group_col]``); the join touches candidate rows only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import BM25_B, BM25_K1
from .topk import bm25_score_all


def _group_rank(
    scored: DataFrame, group_col: str, k: int
) -> DataFrame:
    g = scored.groupBy("query_id", group_col).agg(F.max("score").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc(group_col))
    return (
        g.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", group_col, "score")
    )


def conv_topk(
    corpus: DataFrame,
    qterms: DataFrame,
    k: int = 10,
    group_col: str = "conv_id",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """(query_id, rank, <group_col>, score) — top-k groups per query, group
    score = max BM25 turn score, ties broken by ascending group key.

    Plan shape: turn scoring is the brute-force candidates-only pipeline
    (broadcast query join, shuffle of matching rows only); the group
    aggregate is a map-side-combinable max over candidate rows; the final
    window sorts ≤ groups-with-a-match rows per query."""
    scored = bm25_score_all(corpus, qterms, text_col, id_col, k1=k1, b=b)
    groups = corpus.select(F.col(id_col).alias("doc_id"), group_col)
    return _group_rank(scored.join(groups, "doc_id"), group_col, k)


def conv_topk_indexed(
    spark: SparkSession,
    index_dir: str,
    qterms: DataFrame,
    k: int = 10,
    group_col: str = "conv_id",
) -> DataFrame:
    """Index-backed twin of :func:`conv_topk`: exact turn scores from the
    decoded posting blocks (directory-pruned to the queried terms, same
    kernel as threshold search), doc_id → group through the index's
    ``doc_map`` table. Must match :func:`conv_topk` rank-identically.

    At scale the doc_map join is a shuffle join of candidate rows against
    the doc_map relation — Catalyst/AQE pick the strategy; candidates are
    bounded by the queried terms' document frequency, never the corpus."""
    from ..index.query import threshold_search_indexed
    from ..index.storage import read_table

    scored = threshold_search_indexed(spark, index_dir, qterms, float("-inf"))
    doc_map = read_table(spark, index_dir, "doc_map").select("doc_id", group_col)
    return _group_rank(scored.join(doc_map, "doc_id"), group_col, k)
