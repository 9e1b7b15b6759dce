"""Physical-plan audit helpers — the engine's self-policing of its own
"no per-row Python, everything Arrow-vectorized or JVM-side" rule.

Reference analog: jvector dispatches every hot loop to a SIMD provider and
its tests assert the vectorized and scalar paths agree
(jvector-base/.../vector/VectorizationProvider.java:1-192,
jvector-tests/.../vector/TestVectorizationProvider.java:34-101). The Spark
equivalent of "accidentally running scalar code" is a row-at-a-time Python
UDF — it appears in the physical plan as ``BatchEvalPython``. The allowed
Python boundaries are the Arrow-batched ones: ``ArrowEvalPython`` (pandas
UDF), ``MapInPandas``, ``FlatMapGroupsInPandas`` (applyInPandas).

These helpers parse ``df.explain`` output; tests run every headline plan
through :func:`assert_no_row_python` (SURVEY.md §7 hard part (d): "audit
plans for BatchEvalPython of non-Arrow UDFs").
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

# row-at-a-time Python execution — forbidden in this engine
_ROW_PYTHON = ("BatchEvalPython",)
# Arrow-batched Python boundaries — allowed (the "pandas UDF" fast path)
_ARROW_PYTHON = (
    "ArrowEvalPython",
    "MapInPandas",
    "FlatMapGroupsInPandas",
    "MapInArrow",
    "FlatMapGroupsInArrow",
)


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what ``df.explain(mode)`` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def python_eval_nodes(df: DataFrame) -> dict[str, list[str]]:
    """Classify every Python-eval operator in the physical plan into
    ``row`` (forbidden BatchEvalPython) and ``arrow`` (allowed) buckets."""
    plan = explain_str(df, "simple")
    row = [n for n in _ROW_PYTHON if n in plan]
    arrow = [n for n in _ARROW_PYTHON if n in plan]
    return {"row": row, "arrow": arrow}

def assert_no_row_python(df: DataFrame, name: str = "plan") -> None:
    """Raise if the physical plan evaluates any row-at-a-time Python UDF."""
    nodes = python_eval_nodes(df)
    if nodes["row"]:
        raise AssertionError(
            f"{name}: physical plan contains row-at-a-time Python "
            f"({nodes['row']}) — use a pandas UDF / mapInPandas instead:\n"
            + explain_str(df, "simple")
        )


def pushed_filters(df: DataFrame) -> list[str]:
    """Every non-empty PushedFilters entry in the formatted plan — evidence
    that predicates reached the Parquet scan instead of filtering post-hoc."""
    plan = explain_str(df, "formatted")
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.append(body)
    return out


def plan_audit(df: DataFrame) -> dict:
    """One-call summary used by tests and by hand during tuning:
    python-eval classification, pushed filters, scan read-schemas, exchange
    (shuffle) count, and WholeStageCodegen span count."""
    formatted = explain_str(df, "formatted")
    simple = explain_str(df, "simple")
    return {
        "python": python_eval_nodes(df),
        "pushed_filters": pushed_filters(df),
        "read_schemas": re.findall(r"ReadSchema: (\S+)", formatted),
        "exchanges": simple.count("Exchange"),
        "wholestage_spans": len(set(re.findall(r"\*\((\d+)\)", simple))),
        "has_broadcast": "BroadcastExchange" in simple
        or "BroadcastHashJoin" in simple,
    }
