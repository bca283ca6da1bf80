"""SparkSession factory with deterministic, scale-oriented defaults.

Reference parity: the reference declares "fine-tuning Spark configurations,
partitioning data, and leveraging parallel processing" (reference README.md:8)
and an ETL that must produce consistent results (README.md:12). We centralize
session construction so every entry point (driver contract, tests, bench) runs
with identical, deterministic configuration:

- UTC session timezone (hash-stable timestamps vs the DuckDB oracle).
- AQE on: runtime shuffle-partition coalescing, skew-join splitting, and
  broadcast-join conversion — the mechanisms that keep these plans healthy when
  the same code runs on a 1000-executor cluster instead of local[32].
- Arrow-accelerated Python<->JVM transfer for the pandas-UDF surface.

At 100 TB the same code runs unchanged; only `master`, executor sizing, and
`spark.sql.shuffle.partitions` (left to AQE) change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def shuffle_partitions_for(sf_dir: str) -> int:
    """Volume-scaled shuffle-partition policy — the institutionalized form
    of the measured sf10 spill remedy (SCALE.md: at 100x grain, 16
    partitions spill market_basket_pairs ~3.2 GB to disk; 64 partitions
    halve its wall and cut spill by a third). Target ~32 MB of source
    parquet per shuffle partition, floor 16 (the measured sweet spot at
    sf<=1 where scheduling overhead dominates), next power of two, capped
    at 1024. sf0.1/sf1 -> 16 (unchanged), sf10 -> 64 (the measured
    remedy). On a real cluster the same rule runs against the catalog's
    table-size stats; AQE still coalesces/splits at runtime — this sets
    the pre-AQE grain so one partition's working set fits executor
    memory."""
    try:
        total = sum(
            os.path.getsize(os.path.join(sf_dir, f))
            for f in os.listdir(sf_dir)
            if f.endswith(".parquet")
        )
    except OSError:
        return 16
    n, want = 16, max(1, total // (32 << 20))
    while n < want and n < 1024:
        n *= 2
    return n


def get_spark(app_name: str = "t20-etl-spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS") or str(os.cpu_count() or 4)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        # Modest static number; AQE coalesces down / splits skew at runtime.
        # 16 measured fastest across the whole suite at sf0.1 on 32 cores
        # (32: 87 s, 16: 73 s, 8: 79 s) — task-scheduling overhead dominates
        # below ~10 MB/partition, parallelism starves above it. At 100 TB
        # this knob scales with data volume (or is left to AQE entirely);
        # the env override exists so a cluster profile can set it.
        .config(
            "spark.sql.shuffle.partitions",
            os.environ.get("T20_SHUFFLE_PARTITIONS", "16"),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("T20_DRIVER_MEM", "8g"))
        # UI off by default (faster session startup); the scaling harness
        # (tools/bench_scaling.py) enables it to read per-stage shuffle /
        # spill / peak-memory telemetry from the REST status API.
        .config("spark.ui.enabled", os.environ.get("T20_UI_ENABLED", "false"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(32 * 1024 * 1024))
        # Legacy-layout tolerance: earlier fixture generations wrote
        # events.ts as TIMESTAMP(NANOS), which Spark's vectorized reader
        # rejects; with this conf it reads as long nanos and the scan layer
        # (sources/tables.py) converts — same ns→µs truncation DuckDB
        # applies. Current fixtures are naive µs (read as TIMESTAMP_NTZ),
        # where this conf is inert.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Bucketed-table warehouse (join_bucketed_colocated) lives in scratch
        # space, not the repo.
        .config("spark.sql.warehouse.dir", "/tmp/t20_warehouse")
    )
    return builder.getOrCreate()
