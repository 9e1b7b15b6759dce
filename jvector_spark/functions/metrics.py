"""Retrieval-accuracy metrics: recall@k and MAP@k vs an exact ground truth.

Reference analog: jvector's AccuracyMetrics — ``recall@k = |gt ∩ ret| / k``
over the top-k prefix, and mean average precision
(jvector-examples/.../util/AccuracyMetrics.java:40-48,129-137). Used by
``bench.py`` to report that the engine's approximate tiers (LSH / IVF) sit
where they should, and that the exact tiers score recall = 1.0
(rank-identical) by construction.

Both DataFrame inputs carry (query_id, rank, id_col); ground truth is the
exact oracle's top-k. Computation is a join + groupBy — no collect until
the final per-query frame (one row per query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def recall_at_k(
    results: DataFrame, truth: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """(query_id, recall) — |truth_top_k ∩ result_top_k| / k per query."""
    r = results.filter(F.col("rank") <= k).select("query_id", id_col)
    t = truth.filter(F.col("rank") <= k).select("query_id", id_col)
    hits = r.join(t, ["query_id", id_col]).groupBy("query_id").agg(
        F.count("*").alias("n_hit")
    )
    base = t.groupBy("query_id").agg(F.count("*").alias("n_true"))
    return base.join(hits, "query_id", "left").select(
        "query_id",
        (
            F.coalesce(F.col("n_hit"), F.lit(0)) / F.least(F.lit(k), F.col("n_true"))
        ).alias("recall"),
    )


def map_at_k(
    results: DataFrame, truth: DataFrame, k: int, id_col: str = "doc_id"
) -> DataFrame:
    """(query_id, ap) — average precision over the top-k result prefix:
    mean over relevant ranks i of precision@i.

    WINDOW-FREE by design: with the relevant ranks of a query sorted
    ascending, precision at the i-th relevant rank r_i is exactly
    (i+1)/r_i, so the running-count window collapses to an array
    expression over a ≤k-element ``collect_list`` — one groupBy, no
    window shuffle. (It also dodges a Catalyst trap: when query_id is a
    constant — the single-query bench harness tags results with lit(0) —
    FoldablePropagation strips the constant partition key OUT of a
    window spec and the plan degrades to an unpartitioned WindowExec.)"""
    r = results.filter(F.col("rank") <= k).select("query_id", "rank", id_col)
    t = truth.filter(F.col("rank") <= k).select("query_id", id_col)
    rel = r.join(t, ["query_id", id_col]).select("query_id", "rank")
    base = t.groupBy("query_id").agg(F.count("*").alias("n_true"))
    ap = rel.groupBy("query_id").agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list("rank")),
                lambda x, i: (i + F.lit(1)).cast("double") / x,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ).alias("s")
    )
    return base.join(ap, "query_id", "left").select(
        "query_id",
        (
            F.coalesce(F.col("s"), F.lit(0.0))
            / F.least(F.lit(k), F.col("n_true"))
        ).alias("ap"),
    )


def mean_metric(per_query: DataFrame, col: str) -> float:
    """Scalar mean over the per-query metric frame."""
    row = per_query.agg(F.avg(col)).collect()[0][0]
    return float(row) if row is not None else 0.0
