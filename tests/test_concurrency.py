"""Thread-safety of the operator surface: many queries driven concurrently
through ONE SparkSession (the multi-tenant / notebook-server shape) must
produce exactly the sequential results. Spark sessions are thread-safe by
contract; this pins that our operators don't break it with shared mutable
state (temp-view names, scratch paths)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from t20_database_etl_pipeline_assignment_spark.registry import QUERIES

NAMES = [
    "agg_hash_group",
    "join_multiway_star",
    "win_row_number_topk",
    "text_stats",
    "filter_pred",
    "fn_math",
    "set_union_all",
    "topk_global",
]


def test_concurrent_queries_share_one_session(spark, sf_dir):
    def run(name: str) -> int:
        return QUERIES[name](spark, sf_dir).count()

    with ThreadPoolExecutor(max_workers=8) as ex:
        concurrent = list(ex.map(run, NAMES))
    sequential = [run(n) for n in NAMES]
    assert concurrent == sequential
