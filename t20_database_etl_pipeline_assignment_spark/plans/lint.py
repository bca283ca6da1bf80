"""Plan linter: mechanical detection of scale anti-patterns in a physical
plan (SURVEY.md §4). The same checks the whole-surface regression sweep
runs (tests/test_plan_quality.py) — exposed as a library so a pipeline can
gate its own plans before submitting them to a 1000-executor cluster:

    from t20_database_etl_pipeline_assignment_spark.plans.lint import lint
    findings = lint(df)          # [] means clean
    findings = lint(df, allow={"bnlj"})   # reviewed exception

Each finding is (code, message). Codes:
- ``cartesian``    — CartesianProduct: unbounded quadratic blow-up.
- ``bnlj``         — BroadcastNestedLoopJoin: legitimate ONLY for broadcast
                     1-row scalars / intentionally bounded cross joins;
                     anything else is a missing equi-key.
- ``row_python``   — BatchEvalPython: row-at-a-time Python in the plan
                     (10-100× slower than Arrow-batched pandas kernels).
- ``global_sort``  — a single-partition global Sort that is not a bounded
                     top-k (TakeOrderedAndProject): the whole dataset lands
                     on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from .inspect import plan_string

_CODES = ("cartesian", "bnlj", "row_python", "global_sort")


def lint_text(plan: str, allow: set[str] | frozenset[str] = frozenset()) -> list[tuple[str, str]]:
    """Lint an already-rendered physical plan string."""
    findings: list[tuple[str, str]] = []
    if "cartesian" not in allow and "CartesianProduct" in plan:
        findings.append(("cartesian", "CartesianProduct in plan — quadratic row blow-up"))
    if "bnlj" not in allow and "BroadcastNestedLoopJoin" in plan:
        findings.append(
            ("bnlj", "BroadcastNestedLoopJoin — fine for 1-row scalar broadcasts, "
                     "otherwise a missing equi-key")
        )
    if "row_python" not in allow and "BatchEvalPython" in plan:
        findings.append(
            ("row_python", "row-at-a-time Python UDF in plan — use pandas_udf/Arrow")
        )
    if "global_sort" not in allow and _has_global_sort(plan):
        findings.append(
            ("global_sort", "global Sort without top-k bound — single-task bottleneck")
        )
    return findings


def _has_global_sort(plan: str) -> bool:
    # Exchange SinglePartition feeding a Sort, with no TakeOrderedAndProject
    # absorbing it, is the one-task-sorts-everything shape.
    return (
        "Exchange SinglePartition" in plan
        and "Sort " in plan
        and "TakeOrderedAndProject" not in plan
    )


def lint(df: DataFrame, allow: set[str] | frozenset[str] = frozenset()) -> list[tuple[str, str]]:
    """Lint a DataFrame's physical plan. `allow` suppresses reviewed codes."""
    unknown = set(allow) - set(_CODES)
    if unknown:
        raise ValueError(f"unknown lint codes in allow: {sorted(unknown)}")
    return lint_text(plan_string(df), allow)
