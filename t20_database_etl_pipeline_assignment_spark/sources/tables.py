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

    The LAZY scan handle is memoized per (Spark application, sf_dir,
    name) — the same idiom as staging.cached_df's reader memo, for the
    same r10-profiled reason: `spark.read.parquet` costs ~50-100 ms of
    driver-side Py4J + file-listing latency per call and every query
    re-resolves 1-6 fixture tables per invocation. Only the handle is
    memoized — every action still scans the parquet on disk — and it is
    safe because a fixture directory is immutable within a process (the
    driver regenerates /root/testdata between rounds, i.e. between
    processes, and .scale_fixtures regeneration likewise precedes the
    runs that read it).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; have {TABLE_NAMES}")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    got = _SCAN_MEMO.get(key)
    if got is not None:
        return got
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    if name in _RESTAGE_TABLES:
        df = _restaged(spark, sf_dir, name)
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn(
            "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
        )
    _SCAN_MEMO[key] = df
    return df


# lazy fixture-scan handles per (application id, sf_dir, table) — see table()
_SCAN_MEMO: dict = {}


# The documents table feeds interpreted higher-order-function work (token
# explodes, n-gram zips, regex scans — all outside whole-stage codegen),
# so scan parallelism is the whole ballgame — and the fixture file arrives
# as a SINGLE parquet row group, which Spark can never split: one busy
# core no matter the cluster. Restage it once into right-sized splits
# (the standard move for unsplittable landing-zone files at 100 TB) and
# let every consumer scan the staged copy in parallel. The other tables
# stay on the raw files: vectorized scans + shuffle parallelism already
# serve the relational ones, and the tiny `embeddings` table mostly feeds
# iterative algorithms (IVF training, propagation loops) where extra input
# splits just add task-scheduling overhead per round. Split count is
# capped: per-split HOF work saturates well before per-task overhead does.
_RESTAGE_TABLES = {"documents", "events"}
_RESTAGE_MAX_SPLITS = 8


def _restaged(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from .staging import cached_df, index_cache_dir

    n_splits = min(_RESTAGE_MAX_SPLITS, spark.sparkContext.defaultParallelism)
    return cached_df(
        spark,
        index_cache_dir(sf_dir, f"resplit_{name}"),
        lambda: spark.read.parquet(f"{sf_dir}/{name}.parquet").repartition(n_splits),
    )
