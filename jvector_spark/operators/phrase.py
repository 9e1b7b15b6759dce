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
    *terms: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_phrase) — docs containing the exact n-term phrase
    ``terms`` (adjacent, in order), with occurrence counts. Same arity as
    the index-backed ``positions.phrase_count_indexed`` so the two paths
    cross-check each other for any phrase length.

    Plan shape: the positional relation is filtered to the phrase's terms
    (pushed to the scan), then chained through n-1 equi-joins on
    (doc_id, pos + i) — each join input is only the matching term's
    occurrences, never the full corpus relation."""
    if len(terms) < 2:
        raise ValueError("phrase needs >= 2 terms")
    pos = token_positions(corpus, text_col, id_col)
    acc = pos.filter(F.col("term") == terms[0]).select(
        F.col(id_col), F.col("pos").alias("p")
    )
    for i, t in enumerate(terms[1:], start=1):
        nxt = pos.filter(F.col("term") == t).select(
            F.col(id_col), F.col("pos").alias("p_next")
        )
        acc = (
            acc.join(nxt, [id_col])
            .filter(F.col("p_next") == F.col("p") + i)
            .select(id_col, "p")
        )
    return acc.groupBy(id_col).agg(F.count("*").cast("long").alias("n_phrase"))


def proximity_count(
    corpus: DataFrame,
    t1: str,
    t2: str,
    *,
    slop: int = 3,
    ordered: bool = False,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_prox) — docs where ``t1`` and ``t2`` co-occur within
    ``slop`` token positions, with the number of qualifying position pairs.

    ``ordered=False`` (the default) counts pairs with ``|pos2 - pos1| <=
    slop`` (the classic unordered proximity / "NEAR" query); ``ordered=True``
    requires ``t2`` to FOLLOW ``t1`` within the window (``0 < pos2 - pos1 <=
    slop`` — phrase-with-slop). ``slop=1, ordered=True`` degenerates to the
    2-term exact phrase.

    Plan shape: same as :func:`phrase_count` — the positional relation is
    filtered to the two terms (pushed to the scan) and equi-joined on
    doc_id, so join inputs are the matching terms' occurrences only, never
    the corpus. The index-backed twin is
    ``index.positions.proximity_count_indexed``.
    """
    if t1 == t2:
        raise ValueError("proximity terms must differ (a position holds one term)")
    if slop < 1:
        raise ValueError(f"slop must be >= 1, got {slop}")
    pos = token_positions(corpus, text_col, id_col)
    a = pos.filter(F.col("term") == t1).select(F.col(id_col), F.col("pos").alias("p1"))
    b = pos.filter(F.col("term") == t2).select(F.col(id_col), F.col("pos").alias("p2"))
    d = F.col("p2") - F.col("p1")
    cond = (d >= 1) & (d <= slop) if ordered else (F.abs(d) <= slop)
    return (
        a.join(b, [id_col])
        .filter(cond)
        .groupBy(id_col)
        .agg(F.count("*").cast("long").alias("n_prox"))
    )
