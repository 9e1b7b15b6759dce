"""Boolean retrieval: conjunctive / disjunctive candidate generation.

Reference analog: posting-list traversal during beam search (surveyed Q2,
GraphSearcher.java:387-437) — here expressed as set algebra over the
term-frequency relation. Both are pure aggregations: a semi-restricted
groupBy, no UDFs, no corpus shuffle (the term filter broadcasts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text_stats import term_freq


def _matches(corpus: DataFrame, terms: list[str], text_col: str, id_col: str) -> DataFrame:
    tf = term_freq(corpus, text_col, id_col)
    terms_df = corpus.sparkSession.createDataFrame(
        [(t,) for t in sorted(set(terms))], "term string"
    )
    return tf.join(F.broadcast(terms_df), "term")


def boolean_and(
    corpus: DataFrame, terms: list[str], text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """doc_ids containing ALL of ``terms`` (conjunctive AND)."""
    n = len(set(terms))
    return (
        _matches(corpus, terms, text_col, id_col)
        .groupBy(id_col)
        .agg(F.countDistinct("term").alias("_nt"))
        .filter(F.col("_nt") == n)
        .select(id_col)
    )


def boolean_or(
    corpus: DataFrame, terms: list[str], text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """doc_ids containing ANY of ``terms`` (disjunctive OR)."""
    return _matches(corpus, terms, text_col, id_col).select(id_col).distinct()
