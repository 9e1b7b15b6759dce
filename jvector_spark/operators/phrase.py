"""Positional operators: token positions and phrase (adjacency) matching —
SURVEY.md §2.2 ``phrase_rank`` (stretch op of the new engine; no direct
reference analog, the graft of multi-hop adjacency traversal).

Positions come from ``posexplode`` over the filtered token array; a phrase
"t1 t2" matches where t1 is at position p and t2 at p+1 — a self-equi-join
on (doc_id, position), which Catalyst executes as a hash join on the
narrow positional relation (only rows matching the two terms survive the
pushed filters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.analysis import tokens_col


def token_positions(
    corpus: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, pos, term) — 1-based position in the normalized stream."""
    return corpus.select(
        F.col(id_col), F.posexplode(tokens_col(text_col)).alias("pos0", "term")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "term")


def phrase_count(
    corpus: DataFrame,
    term1: str,
    term2: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_phrase) — docs containing term1 immediately followed by
    term2, with occurrence counts."""
    pos = token_positions(corpus, text_col, id_col)
    a = pos.filter(F.col("term") == term1).select(
        F.col(id_col), F.col("pos").alias("p1")
    )
    b = pos.filter(F.col("term") == term2).select(
        F.col(id_col), F.col("pos").alias("p2")
    )
    return (
        a.join(b, [id_col])
        .filter(F.col("p2") == F.col("p1") + 1)
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_phrase"))
    )
