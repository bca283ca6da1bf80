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
from pyspark.sql import functions as F

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
    """Scan one fixture table. Columnar, pruned, pushdown-capable.

    `events.ts` is TIMESTAMP(NANOS) in Parquet, which Spark has no native
    type for (TimestampType is µs). With `spark.sql.legacy.parquet.
    nanosAsLong=true` it arrives as long nanoseconds; we convert to a µs
    timestamp with integer arithmetic (`div 1000` — exact, and identical to
    DuckDB's ns→µs truncation). Cost at scale: predicates on `ts` can't push
    into this scan as timestamp stats — a production layout would store µs;
    the conversion is confined here so every operator sees a plain
    TimestampType column.
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    if name == "events":
        # Runtime-settable; required for TIMESTAMP(NANOS) parquet under ANY
        # caller-provided session (the driver passes its own SparkSession —
        # relying on our session factory alone breaks there).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df
