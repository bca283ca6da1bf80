"""End-to-end pipeline runner tests (reference README.md:10,12): a full run
produces conforming outputs, and a rerun of the same batch is idempotent —
the incremental path must not double-load, and SCD2 must not churn when
nothing changed.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from t20_database_etl_pipeline_assignment_spark.pipeline import run_etl


@pytest.fixture()
def target_dir():
    d = tempfile.mkdtemp(prefix="t20_pipeline_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_pipeline_end_to_end_and_idempotent(spark, sf_dir, target_dir):
    m1 = run_etl(spark, sf_dir, target_dir, batch_ts="2026-01-01 00:00:00")

    # facts: valid rows only, partitioned by ship_year
    assert m1["rows_valid"] == m1["fact_rows"]
    assert m1["rows_valid"] > 0
    assert sum(m1["rejects_by_rule"].values()) >= 0

    # SCD2 invariants after first run: one current row per key, tiled ranges
    dim = spark.read.parquet(f"{target_dir}/dim_customer")
    per_key = dim.groupBy("c_custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur")
    )
    assert per_key.filter(F.col("n_cur") != 1).count() == 0
    assert dim.filter(F.col("effective_from") >= F.col("effective_to")).count() == 0

    # fact layout: Hive-style ship_year partitions actually materialized
    import glob

    part_dirs = glob.glob(f"{target_dir}/fact_lineitem/ship_year=*")
    assert len(part_dirs) >= 2, part_dirs

    # rerun same batch: nothing changed ⇒ same dim rows, same event count
    m2 = run_etl(spark, sf_dir, target_dir, batch_ts="2026-01-02 00:00:00")
    assert m2["dim_customer_rows"] == m1["dim_customer_rows"]
    assert m2["events_rows"] == m1["events_rows"]
    assert m2["fact_rows"] == m1["fact_rows"]
