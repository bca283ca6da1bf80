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

    All fixture timestamps (`events.ts`, `o_orderdate`, `l_shipdate`) are
    naive µs Parquet timestamps (isAdjustedToUTC=false), which Spark reads
    as TIMESTAMP_NTZ — matching DuckDB's naive TIMESTAMP bit-for-bit with
    no session-timezone dependence, so timestamp stats push down into the
    scan untouched. Event-time arithmetic stays NTZ-safe via
    exprs.epoch_us/ntz_from_us (timestamp_diff/add against a fixed NTZ
    epoch) because unix_micros & friends only accept the LTZ type.

    Legacy tolerance: earlier fixture generations wrote `events.ts` as
    TIMESTAMP(NANOS), which Spark can only read as long nanoseconds under
    `nanosAsLong` — that layout is detected by dtype and converted to the
    same NTZ µs column (exact `div 1000`, identical to DuckDB's ns→µs
    truncation). The conf is runtime-settable, so this works under ANY
    caller-provided session (the driver passes its own SparkSession).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    return df
