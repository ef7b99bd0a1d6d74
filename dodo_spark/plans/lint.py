"""Physical-plan linter: the anti-pattern checks tests/test_plans.py and
tools/plan_audit.py enforce on the registry, packaged as a reusable API +
CLI verb so a USER's ad-hoc query gets the same scale review before it
ships to a 1000-executor cluster.

Checks (each finding carries severity, code, and the offending line):
- ``CARTESIAN`` (error): a CartesianProduct — |left| x |right| rows.
- ``ROW_PYTHON_UDF`` (error): BatchEvalPython — a row-at-a-time Python
  UDF in the plan; Arrow/pandas UDFs (ArrowEvalPython) pass.
- ``UNBOUNDED_BNLJ`` (warn): BroadcastNestedLoopJoin — fine for a 1-row
  broadcast audit, a scale killer for anything larger.
- ``GLOBAL_WINDOW`` (error): a Window over an empty partitionBy that
  funnels every row into one task (detected via Exchange SinglePartition
  feeding an under-specified windowspecdefinition).
- ``NO_PUSHDOWN`` (warn): a Filter in the plan while some scan reports
  ``PushedFilters: []`` — the predicate never reached the reader.
- ``SINGLE_PARTITION_EXCHANGE`` (warn): any Exchange SinglePartition
  outside a final bounded ORDER BY/LIMIT is a serialization point.

The linter reads the FORMATTED explain (post-AQE initial plan) — the
same text the plan-audit artifact records.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame

__all__ = ["plan_text", "lint_plan", "lint_plan_text", "lint_findings_exit_code"]


def plan_text(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _finding(severity: str, code: str, detail: str) -> dict:
    return {"severity": severity, "code": code, "detail": detail}


def lint_plan(df: DataFrame) -> list[dict]:
    """Lint one DataFrame's physical plan; returns findings (possibly
    empty), errors first."""
    return lint_plan_text(plan_text(df))


def lint_plan_text(plan: str) -> list[dict]:
    """Lint an already-rendered formatted explain (lets callers that
    cache plan text — the registry-wide CI lint — avoid re-explaining)."""
    out: list[dict] = []
    if "CartesianProduct" in plan:
        out.append(
            _finding(
                "error",
                "CARTESIAN",
                "CartesianProduct joins every row to every row; add an "
                "equi-join key, a bucketed range join, or broadcast a "
                "bounded side",
            )
        )
    if "BatchEvalPython" in plan:
        out.append(
            _finding(
                "error",
                "ROW_PYTHON_UDF",
                "row-at-a-time Python UDF (BatchEvalPython); rewrite with "
                "built-in functions or an Arrow-batched pandas_udf",
            )
        )
    for line in plan.splitlines():
        if "windowspecdefinition" in line and line.strip().startswith("Arguments:"):
            if line.count("], [") < 2 and "SinglePartition" in plan:
                out.append(
                    _finding(
                        "error",
                        "GLOBAL_WINDOW",
                        "Window with empty partitionBy funnels all rows "
                        "into one task; partition the window or replace "
                        "with a 1-row aggregate broadcast",
                    )
                )
                break
    if "BroadcastNestedLoopJoin" in plan:
        out.append(
            _finding(
                "warn",
                "UNBOUNDED_BNLJ",
                "BroadcastNestedLoopJoin: acceptable only when the "
                "broadcast side is provably tiny (1-row audit totals); "
                "otherwise add an equi-join key",
            )
        )
    # a real Filter NODE ("(3) Filter"), not the substring inside the
    # "PushedFilters:" line itself
    if "PushedFilters: []" in plan and re.search(r"\(\d+\) Filter\b", plan):
        out.append(
            _finding(
                "warn",
                "NO_PUSHDOWN",
                "a scan reports PushedFilters: [] while the plan filters; "
                "the predicate never reached the reader (non-pushable "
                "expression or a barrier above the scan)",
            )
        )
    # a SinglePartition exchange NOT explained by a global window finding
    # (TakeOrderedAndProject avoids one; plain .orderBy() without a limit
    # plans a rangepartitioning exchange instead, so any remaining
    # SinglePartition is a deliberate funnel worth flagging). Formatted
    # explain renders it as an Exchange node whose Arguments line leads
    # with SinglePartition.
    if "SinglePartition" in plan and not any(
        f["code"] == "GLOBAL_WINDOW" for f in out
    ):
        out.append(
            _finding(
                "warn",
                "SINGLE_PARTITION_EXCHANGE",
                "Exchange SinglePartition serializes the stage into one "
                "task; bounded final collects are fine, anything feeding "
                "more computation is not",
            )
        )
    order = {"error": 0, "warn": 1}
    out.sort(key=lambda f: order[f["severity"]])
    return out


def lint_findings_exit_code(findings: list[dict]) -> int:
    return 1 if any(f["severity"] == "error" for f in findings) else 0
