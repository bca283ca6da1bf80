"""Physical-plan introspection toolkit (SURVEY.md §4).

The engine writes zero custom Catalyst rules — its performance contract is
that the DECLARED plans compile to the right PHYSICAL shapes (broadcast for
dims, pushdown into scans, partial aggregation, bucketed co-location, DPP).
This module is the API for checking that contract: used by
tests/test_plan_quality.py as the regression gate, and available to users
debugging why a plan stopped scaling.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text. `formatted` = tree + per-node detail
    (each node named twice); `simple` = tree only (one mention per node —
    use for counting operators)."""
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def count_nodes(df: DataFrame, node: str) -> int:
    """How many times a physical operator appears in the plan tree."""
    return plan_string(df, mode="simple").count(node)


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters list in the plan — what actually reached the
    Parquet/ORC scans (empty list entries mean a scan with no pushdown)."""
    return re.findall(r"PushedFilters: \[(.*?)\]", plan_string(df))


def read_schemas(df: DataFrame) -> list[str]:
    """Every scan's ReadSchema — the column-pruning ground truth."""
    return re.findall(r"ReadSchema: (struct<[^\n]*>)", plan_string(df))


def has_dynamic_partition_pruning(df: DataFrame) -> bool:
    return "dynamicpruning" in plan_string(df).lower()


def broadcast_join_count(df: DataFrame) -> int:
    return count_nodes(df, "BroadcastHashJoin")


def shuffle_count(df: DataFrame) -> int:
    """Exchanges in the plan tree (includes BroadcastExchange; use
    count_nodes for finer distinctions)."""
    return count_nodes(df, "Exchange")


def smj_small_sides(df: DataFrame) -> list[str]:
    """For every SortMergeJoin in the (initial) physical plan, report each
    side whose logical-plan size ESTIMATE is under the session broadcast
    threshold — the shape where static planning shuffled both sides of a
    join that a broadcast would have served shuffle-free. AQE often repairs
    this at runtime, but the repair costs a materialized shuffle stage
    first; the gate catches it at plan time. Returns human-readable size
    strings (empty = clean). Sides without a resolvable logical estimate
    are skipped rather than guessed."""
    spark = df.sparkSession
    raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB")
    jvm = spark._jvm
    try:
        thresh = int(jvm.org.apache.spark.network.util.JavaUtils.byteStringAsBytes(str(raw)))
    except Exception:  # noqa: BLE001 — unparseable conf: skip the check
        return []
    if thresh <= 0:  # broadcast disabled: SMJ is the intended strategy
        return []

    plan = df._jdf.queryExecution().executedPlan()
    smjs: list = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.initialPlan())
            return
        if name == "SortMergeJoinExec":
            smjs.append(node)
        kids = node.children()
        for i in range(kids.length()):
            walk(kids.apply(i))

    walk(plan)
    out: list[str] = []
    for j in smjs:
        # The whole per-join inspection reflects into JVM internals
        # (joinType/logicalLink/children via py4j); an exotic plan node
        # that errors on any of those calls should skip THIS join, not
        # crash lint() — same stance as the stats-unavailable skip below.
        try:
            # only the broadcast-ELIGIBLE build side matters: inner/cross
            # can build either side; left outer/semi/anti and existence
            # joins can only build RIGHT; right outer only LEFT; full
            # outer neither
            jt = str(j.joinType()).replace("_", "").lower()
            if jt in ("inner", "cross"):
                eligible = (0, 1)
            elif jt in ("leftouter", "leftsemi", "leftanti") or jt.startswith("existence"):
                eligible = (1,)
            elif jt == "rightouter":
                eligible = (0,)
            else:  # full outer (and anything unknown): SMJ is the right call
                continue
            link = j.logicalLink()  # the logical Join this SMJ compiles
            if not link.isDefined():
                continue
            kids = link.get().children()
            for i in eligible:
                if i >= kids.length():
                    continue
                try:
                    size = int(str(kids.apply(i).stats().sizeInBytes()))
                except Exception:  # noqa: BLE001 — stats unavailable: skip
                    continue
                if size < thresh:
                    side = "left" if i == 0 else "right"
                    out.append(f"{jt} {side} side {size}B (threshold {thresh}B)")
        except Exception:  # noqa: BLE001 — py4j reflection failed: skip join
            continue
    return out
