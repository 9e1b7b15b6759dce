"""Corpus statistics operators: term frequencies, document stats, dictionary.

These are the text-domain analog of jvector's corpus preparation + global
metadata maintenance (entry-point/stats refresh, surveyed as M2 at
GraphIndexBuilder.java:770-789): everything is a plain groupBy — map-side
partial aggregation and AQE handle the heavy lifting, no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col
from .doc_ids import assign_dense_ids


def term_freq(corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, term, tf) — explode normalized tokens, count per doc.

    Shuffle profile: one hash shuffle on (doc_id, term) with map-side
    combine; the explode itself is narrow.
    """
    return (
        corpus.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def doc_stats(corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, dl) — document length in tokens, computed narrowly (no
    shuffle: dl is a per-row expression)."""
    return corpus.select(
        F.col(id_col), F.size(tokens_col(text_col)).cast("long").alias("dl")
    )


def with_corpus_stats(dstats: DataFrame) -> DataFrame:
    """1-row (n_docs, avgdl) frame for broadcast cross-join into scoring
    plans — keeps global stats inside the Catalyst plan instead of a
    driver-side collect."""
    return dstats.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.avg("dl").cast("double").alias("avgdl"),
    )


def dictionary(
    tf: DataFrame,
    id_col: str = "doc_id",
    assign_term_ids: bool = True,
) -> DataFrame:
    """(term, df, cf [, term_id]) — the text-domain codebook (reference
    analog: PQ codebook training, quantization/ProductQuantization.java:88-154
    surveyed as C1). term_id is a dense rank over lexicographic term order,
    assigned with the scalable range-partition pattern (no global window).
    """
    d = tf.groupBy("term").agg(
        F.count("*").cast("long").alias("df"),  # tf rows are unique per (doc, term)
        F.sum("tf").cast("long").alias("cf"),
    )
    if assign_term_ids:
        d = assign_dense_ids(d, ["term"], id_col="term_id")
    return d
