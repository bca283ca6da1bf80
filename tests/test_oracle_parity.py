"""Differential oracle parity for every registered operator (SURVEY.md §5.2.1).

Mirrors the driver's correctness gate: each queries() entry runs on Spark and
its oracle_sql() runs on DuckDB over the same parquet; results must match
order-insensitively and bit-exactly.
"""

from __future__ import annotations

import pytest

from t20_database_etl_pipeline_assignment_spark.registry import QUERIES

from .oracle_harness import check_query


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_oracle_parity(spark, sf_dir, qid):
    n = check_query(spark, qid, sf_dir)
    assert n >= 0
