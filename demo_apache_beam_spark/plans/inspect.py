"""Plan-inspection helpers — the engine's feedback loop for scale work.

Every operator should be checked with ``explain_str(df)`` after it first
passes correctness: filters must appear as ``PushedFilters`` on the scan,
projections must narrow ``ReadSchema``, and the hot path must sit inside
``WholeStageCodegen`` spans (SURVEY.md §4.2).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def assert_pushed_down(df: DataFrame, fragment: str) -> None:
    """Assert a filter/column fragment reached the physical scan — used in
    plan tests so scale regressions fail CI, not production."""
    plan = explain_str(df)
    if fragment not in plan:
        raise AssertionError(f"expected {fragment!r} in physical plan:\n{plan}")


def codegen_stage_count(df: DataFrame) -> int:
    """Number of whole-stage-codegen subtrees. Uses codegen explain mode:
    under AQE the simple plan hides codegen markers until execution."""
    header = explain_str(df, "codegen").splitlines()[0]
    # "Found N WholeStageCodegen subtrees."
    for tok in header.split():
        if tok.isdigit():
            return int(tok)
    return 0
