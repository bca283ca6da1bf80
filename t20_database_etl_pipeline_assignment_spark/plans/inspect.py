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
