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
- ``no_pushdown``  — a Filter applies a pushable predicate (plain-column
                     comparison / null test / StartsWith) to a file scan
                     whose PushedFilters is EMPTY: the scan reads every row
                     group the predicate could have skipped.
- ``smj_small_side`` — SortMergeJoin with a side whose logical size
                     estimate is under the broadcast threshold: the join
                     shuffles both sides where a broadcast would shuffle
                     neither (df-based check; needs the live plan).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from .inspect import plan_string, smj_small_sides

_CODES = (
    "cartesian", "bnlj", "row_python", "global_sort", "no_pushdown",
    "smj_small_side",
)


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
    if "no_pushdown" not in allow:
        cols = _unpushed_filter_columns(plan)
        if cols:
            findings.append(
                ("no_pushdown",
                 f"pushable predicate on {sorted(cols)} filters a scan whose "
                 "PushedFilters is empty — predicate never reached the reader")
            )
    return findings


# formatted-plan scan block: "Output [n]: [a#1, b#2]" ... "PushedFilters: []"
_SCAN_BLOCK = re.compile(
    r"Output \[\d+\]: \[([^\]]*)\][^()]*?PushedFilters: \[\]", re.S
)
_ATTR = re.compile(r"(\w+)#(\d+)")


def _unpushed_filter_columns(plan: str) -> set[str]:
    """Columns of empty-PushedFilters file scans that some Filter condition
    tests with a pushable shape: a BARE attribute (no expression wrapping)
    compared to a literal, null-tested, or StartsWith. Casts/functions
    around the column are not pushable-as-written and don't count."""
    empty_scan_attrs: dict[str, str] = {}  # attr id -> name
    for m in _SCAN_BLOCK.finditer(plan):
        for name, num in _ATTR.findall(m.group(1)):
            empty_scan_attrs[num] = name
    if not empty_scan_attrs:
        return set()
    hit: set[str] = set()
    for cond in re.findall(r"Condition : (.*)", plan):
        # bare attr compared against a literal (number, quoted string, date)
        for name, num, _op in re.findall(
            r"(?<![\w)])(\w+)#(\d+)L?\s*(=|>=|<=|>|<)\s*[\d'\"-]", cond
        ):
            if empty_scan_attrs.get(num) == name:
                hit.add(name)
        for fn, name, num in re.findall(
            r"(isnotnull|isnull|StartsWith)\((\w+)#(\d+)", cond, re.I
        ):
            # null tests alone are usually residue of other predicates;
            # only count them when paired with a literal comparison on the
            # same column (handled above) or an explicit StartsWith
            if fn == "StartsWith" and empty_scan_attrs.get(num) == name:
                hit.add(name)
    return hit


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
    findings = lint_text(plan_string(df), allow)
    if "smj_small_side" not in allow:
        for side in smj_small_sides(df):
            findings.append(
                ("smj_small_side",
                 f"SortMergeJoin side estimated {side} — under the broadcast "
                 "threshold; a broadcast join would avoid both shuffles")
            )
    return findings
