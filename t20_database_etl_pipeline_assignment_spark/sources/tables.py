"""Parquet table scans over the driver-provided fixture layout.

SURVEY.md §2.A `scan_parquet`. The fixtures are self-describing Parquet
(TESTDATA.md): one file per table under `{sf_dir}/{name}.parquet`. Spark's
vectorized Parquet reader gives predicate pushdown + column pruning for free
as long as callers express filters/projections declaratively — which every
operator in this package does.

Scale note: at 100 TB these would be directories of many files (ideally
partitioned / bucketed); `spark.read.parquet(path)` handles both shapes
unchanged, and `spark.sql.files.maxPartitionBytes` controls split sizing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one fixture table. Columnar, pruned, pushdown-capable."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
