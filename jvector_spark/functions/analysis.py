"""Text-analysis column expressions (tokenize, counting, quality, language
heuristic, fingerprint).

Everything here is a pure JVM-side Catalyst expression — no UDFs — so
tokenization of 10^12 turns runs inside whole-stage codegen with zero
Python cost. The tokenizer contract is shared verbatim with the DuckDB
oracle SQL and the python reference tokenizer (fixtures.tokenize_py):
lowercase, split on runs of non-[a-z0-9], drop empties.

Reference analog: the corpus-preparation stage of the build pipeline
(jvector's RandomAccessVectorValues construction, graph/RandomAccessVectorValues.java:39-79)
— the step that turns raw payload into the engine's internal value type.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Shared with DuckDB oracle: regexp_split_to_table(lower(text), '[^a-z0-9]+')
TOKEN_PATTERN = "[^a-z0-9]+"

# Tiny embedded stopword/letter-frequency tables for the language-ID heuristic.
_EN_STOP = ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"]
_DE_STOP = ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "den", "von"]
_FR_STOP = ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"]
_ES_STOP = ["el", "la", "los", "las", "y", "de", "que", "es", "un", "una"]


def tokens_col(text: Column | str) -> Column:
    """array<string> of normalized tokens; empties removed.

    `split` on a leading/trailing separator yields empty strings, so we
    filter them — identical semantics to the oracle's `WHERE term <> ''`.
    """
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), TOKEN_PATTERN), lambda t: t != F.lit(""))


def token_count_col(text: Column | str) -> Column:
    """int token count of a text column (document length dl)."""
    return F.size(tokens_col(text))


def quality_cols(text: Column | str) -> dict[str, Column]:
    """Training-data quality signals: length, token count, alpha ratio,
    punctuation ratio, mean token length — cheap codegen'd expressions."""
    c = F.col(text) if isinstance(text, str) else text
    n_chars = F.length(c)
    toks = tokens_col(c)
    n_tokens = F.size(toks)
    alpha_chars = F.length(F.regexp_replace(c, "[^A-Za-z]", ""))
    punct_chars = F.length(F.regexp_replace(c, "[A-Za-z0-9 ]", ""))
    safe_chars = F.when(n_chars > 0, n_chars.cast("double")).otherwise(F.lit(1.0))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "alpha_ratio": (alpha_chars / safe_chars).cast("double"),
        "punct_ratio": (punct_chars / safe_chars).cast("double"),
        "mean_token_len": F.when(
            n_tokens > 0,
            F.aggregate(
                toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
            ).cast("double")
            / n_tokens,
        )
        .otherwise(F.lit(0.0))
        .cast("double"),
    }


def _stop_hits(toks: Column, words: list[str]) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(words)))


def lang_id_col(text: Column | str) -> Column:
    """Cheap stopword-vote language ID over {en, de, fr, es}; 'und'
    (undetermined) when no stopword hits. Deterministic tie-break by
    fixed language order en>de>fr>es via strictly-greater comparisons."""
    toks = tokens_col(text)
    en, de, fr, es = (
        _stop_hits(toks, _EN_STOP),
        _stop_hits(toks, _DE_STOP),
        _stop_hits(toks, _FR_STOP),
        _stop_hits(toks, _ES_STOP),
    )
    best = F.greatest(en, de, fr, es)
    return (
        F.when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def fingerprint_col(text: Column | str) -> Column:
    """Deterministic document fingerprint: min md5 over the token bag.

    md5 is identical in Spark and DuckDB, which makes this fingerprint (and
    the MinHash built on the same idea in operators/dedup.py) cross-engine
    reproducible — the analog of the reference's golden-file determinism
    (jvector-tests resources/version0.pq round-trips).
    """
    toks = tokens_col(text)
    return F.when(F.size(toks) > 0, F.array_min(F.transform(toks, F.md5))).otherwise(
        F.lit(None).cast("string")
    )
