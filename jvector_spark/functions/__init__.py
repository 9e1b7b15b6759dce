"""Column-expression library — all JVM-side ``pyspark.sql.functions`` so the
hot path stays inside whole-stage codegen (no Python)."""

from .analysis import (  # noqa: F401
    TOKEN_PATTERN,
    tokens_col,
    token_count_col,
    quality_cols,
    lang_id_col,
    fingerprint_col,
)
from .bm25 import idf_col, bm25_term_score_col  # noqa: F401
