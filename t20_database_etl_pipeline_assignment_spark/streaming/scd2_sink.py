"""Streaming SCD2 dimension maintenance — the reference's incremental-load
+ SCD declarations (reference README.md:4 incremental loads, README.md:6
SCD Type 2) exercised END-TO-END under Structured Streaming: an event
stream drains through `foreachBatch`, and every micro-batch folds into a
parquet SCD2 dimension with the batch `scd2_apply` kernel
(operators/etl.py) and an atomic two-rename swap.

Exactly-once across restarts, from two at-least-once building blocks:
  - foreachBatch re-delivers a micro-batch (same batch_id) whenever the
    sink ran but the checkpoint offset didn't commit (crash between them);
  - the swap publishes the folded dimension together with a
    `_scd2_sink_state.json` marker carrying the batch_id, in ONE rename.
  On re-delivery the fold reads the marker and skips any batch_id it has
  already published — so every micro-batch folds exactly once no matter
  where the crash landed. (The marker file starts with `_`, which Spark's
  parquet reader ignores.) A crash between the two renames leaves the
  dimension as a recoverable `.old`, restored on the next fold.

Determinism: the fold applies one `scd2_apply` per EVENT-DAY inside each
micro-batch (days in order), with batch_ts = that day. Folding day-sliced
snapshots through scd2_apply is provably equivalent to the one-pass
change-log rebuild over per-(key, day) latest snapshots — by induction on
days: scd2_apply closes a key's current row iff the day's snapshot differs
(hash-diff), which is exactly the rebuild's drop-consecutive-no-ops rule,
and both stamp effective_from/effective_to with the day boundary. The
registered `stream_scd2_sink` query IS that one-pass formulation
(`scd2_daily_fold_spec`), SQL-oracled against DuckDB, so the driver
hash-checks the semantics in batch while tests/test_streaming.py proves
the streaming path (crash + restart included) converges to the same rows.

Scale: per micro-batch the only shuffles are the snapshot row_number and
the scd2_apply key join; the dimension rewrite is bounded by dimension
size, not stream history (the partition-pruned band rewrite in
pipeline.py applies here unchanged once the dimension is band-partitioned).
State on the streaming side is just the checkpoint offsets — the
dimension itself is the state, which is what makes the pattern restartable.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.etl import _FAR_FUTURE, scd2_apply, scd2_init
from ..registry import query
from ..sources.tables import table

_STATE_FILE = "_scd2_sink_state.json"


def _read_state(dim_path: str) -> dict | None:
    try:
        with open(os.path.join(dim_path, _STATE_FILE)) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def recover_dim(dim_path: str) -> None:
    """Heal the crash window between the two publish renames: if the live
    dir is missing but its `.old` survivor exists, restore it."""
    old = dim_path + ".old"
    if not os.path.exists(dim_path) and os.path.exists(old):
        os.rename(old, dim_path)


def atomic_swap_publish(df: DataFrame, dim_path: str, state: dict) -> None:
    """Write `df` + state marker to a temp dir, then swap it live with two
    renames (same discipline as pipeline._overwrite_in_place, plus the
    marker travels INSIDE the published dir so dimension and batch_id are
    one atomic unit)."""
    tmp, old = dim_path + ".tmp-swap", dim_path + ".old"
    shutil.rmtree(tmp, ignore_errors=True)
    df.write.mode("overwrite").parquet(tmp)
    with open(os.path.join(tmp, _STATE_FILE), "w") as f:
        json.dump(state, f)
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(dim_path):
        os.rename(dim_path, old)
    os.rename(tmp, dim_path)
    shutil.rmtree(old, ignore_errors=True)


def scd2_stream_sink(dim_path, keys, attrs, ts_col="ts", tiebreak="event_id"):
    """Build the foreachBatch callable. The returned `fold` records which
    batch_ids it applied vs skipped (`fold.applied` / `fold.skipped`) so
    tests can assert the exactly-once bookkeeping, not just final state."""

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        recover_dim(dim_path)
        st = _read_state(dim_path)
        if st is not None and batch_id <= st["batch_id"]:
            fold.skipped.append(batch_id)  # re-delivered: already published
            return
        day = F.date_trunc("day", F.col(ts_col))
        days = [
            r["d"] for r in batch_df.select(day.alias("d")).distinct().orderBy("d").collect()
        ]  # bounded: distinct event-days inside ONE micro-batch
        if not days:
            return
        target = spark.read.parquet(dim_path) if st is not None else None
        w = Window.partitionBy(*keys).orderBy(F.desc(ts_col), F.desc(tiebreak))
        for d in days:  # in order: each day is one SCD2 batch
            staged = (
                batch_df.filter(day == F.lit(d))
                .withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select(*keys, *attrs)
            )
            bts = str(d)
            if target is None:
                target = scd2_init(staged, batch_ts=bts)
            else:
                target = scd2_apply(
                    target, staged, keys=keys, attrs=attrs, batch_ts=bts
                ).localCheckpoint()
        atomic_swap_publish(target, dim_path, {"batch_id": batch_id})
        fold.applied.append(batch_id)

    fold.applied, fold.skipped = [], []
    return fold


def scd2_daily_fold_spec(events: DataFrame) -> DataFrame:
    """The dimension the day-batched streaming fold converges to, as one
    batch plan (see module docstring for the fold≡rebuild equivalence):
    latest (event_type, value) per (user_id, day) → drop consecutive
    no-op days → effective-date with lead(). Two window passes on the
    same user partitioning."""
    snap = (
        events.withColumn("d", F.date_trunc("day", F.col("ts")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("user_id", "d").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .filter(F.col("_rn") == 1)
        .select("user_id", "event_type", "value", "d")
    )
    w = Window.partitionBy("user_id").orderBy("d")
    chg = (
        snap.withColumn("_pd", F.lag("d").over(w))
        .withColumn("_pt", F.lag("event_type").over(w))
        .withColumn("_pv", F.lag("value").over(w))
        .filter(
            F.col("_pd").isNull()
            | ~F.col("_pt").eqNullSafe(F.col("event_type"))
            | ~F.col("_pv").eqNullSafe(F.col("value"))
        )
    )
    return chg.select(
        "user_id",
        "event_type",
        "value",
        F.col("d").alias("effective_from"),
        F.coalesce(
            F.lead("d").over(w), F.lit(_FAR_FUTURE).cast("timestamp_ntz")
        ).alias("effective_to"),
        F.lead("d").over(w).isNull().alias("is_current"),
    )


@query(
    "stream_scd2_sink",
    oracle=f"""
WITH snap AS (
  SELECT * FROM (
    SELECT user_id, event_type, value, date_trunc('day', ts) AS d,
           ROW_NUMBER() OVER (PARTITION BY user_id, date_trunc('day', ts)
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events) WHERE rn = 1),
chg AS (
  SELECT * FROM (
    SELECT user_id, event_type, value, d,
           LAG(d) OVER w AS pd,
           LAG(event_type) OVER w AS pt,
           LAG(value) OVER w AS pv
    FROM snap WINDOW w AS (PARTITION BY user_id ORDER BY d))
  WHERE pd IS NULL
     OR pt IS DISTINCT FROM event_type
     OR pv IS DISTINCT FROM value)
SELECT user_id, event_type, value,
       d AS effective_from,
       COALESCE(LEAD(d) OVER w2, TIMESTAMP '{_FAR_FUTURE}') AS effective_to,
       LEAD(d) OVER w2 IS NULL AS is_current
FROM chg WINDOW w2 AS (PARTITION BY user_id ORDER BY d)
""",
)
def stream_scd2_sink_query(spark, sf_dir: str) -> DataFrame:
    """Batch-checkable contract for the streaming SCD2 sink: the per-user
    effective-dated history that day-batched micro-batches fold to.
    tests/test_streaming.py runs the REAL sink (foreachBatch + checkpoint
    + injected crash + restart) and asserts it lands on exactly these
    rows."""
    return scd2_daily_fold_spec(table(spark, sf_dir, "events"))
