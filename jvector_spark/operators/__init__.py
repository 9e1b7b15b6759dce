"""DataFrame-native operators of the engine (SURVEY.md §2.2)."""

from .doc_ids import assign_dense_ids  # noqa: F401
from .text_stats import term_freq, doc_stats, with_corpus_stats, dictionary  # noqa: F401
from .topk import bm25_contributions, bm25_score_all, bm25_topk_bruteforce, topk  # noqa: F401
from .boolean import boolean_and, boolean_or  # noqa: F401
