from .audit import (
    assert_no_row_python,
    explain_str,
    plan_audit,
    pushed_filters,
    python_eval_nodes,
)

__all__ = [
    "assert_no_row_python",
    "explain_str",
    "plan_audit",
    "pushed_filters",
    "python_eval_nodes",
]
