"""Event-time operators over `events` (SURVEY.md §2.I).

Reference parity: incremental event processing with integrity guarantees
(reference README.md:4 incremental loads, README.md:12 error handling — here:
dedup, late-data policy). Each operator has a *batch formulation* registered
against the DuckDB oracle (window()/session-logic work identically in batch),
and the same code runs under Structured Streaming — tests/test_streaming.py
proves batch/stream parity with an availableNow trigger.

Determinism notes:
- Event-time arithmetic uses integer microseconds (unix_micros/epoch_us) —
  seconds-granularity casts would silently truncate the fixtures' µs stamps.
- Sliding windows: Spark emits one row per covered window (4 for a 1-day/6-h
  slide); the oracle reconstructs the same set with an explicit 4-offset
  cross join on epoch-aligned starts.

Scale: tumbling/sliding aggs shuffle once on (window, key) with map-side
partials; session windows + dedup keep per-key state bounded by the
watermark horizon — that bound IS the 100 TB design (state never grows past
horizon × arrival rate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import epoch_us, scaled_long, sql_money_sum
from ..registry import query
from ..sources.tables import table

GAP_US = 30 * 60 * 1_000_000  # 30-minute session gap, in microseconds


@query(
    "stream_tumbling",
    oracle=f"""
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
       COUNT(*) AS n_events,
       {sql_money_sum("value")} AS total_value
FROM events
GROUP BY event_type, window_start
""",
)
def stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "1 day").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(scaled_long(F.col("value"), 100)) / F.lit(100.0)).alias("total_value"),
        )
        .select(
            "event_type", F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )


@query(
    "stream_sliding",
    oracle=f"""
WITH s AS (SELECT event_type, value,
                  CAST(FLOOR(epoch(ts)) AS BIGINT) AS es
           FROM events),
w AS (SELECT event_type, value,
             make_timestamp((((es // 21600) - t.k) * 21600) * 1000000) AS window_start
      FROM s CROSS JOIN (VALUES (0), (1), (2), (3)) t(k))
SELECT event_type, window_start,
       COUNT(*) AS n_events,
       {sql_money_sum("value")} AS total_value
FROM w
GROUP BY event_type, window_start
""",
)
def stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day window sliding every 6 h: each event lands in 4 windows, all
    epoch-aligned to the slide (UTC session tz = same alignment as oracle)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.window("ts", "1 day", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(scaled_long(F.col("value"), 100)) / F.lit(100.0)).alias("total_value"),
        )
        .select(
            "event_type", F.col("w.start").alias("window_start"), "n_events", "total_value"
        )
    )


@query(
    "stream_session",
    oracle=f"""
WITH t AS (
  SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events),
flagged AS (
  SELECT user_id, event_id, ts, value, us,
         CASE WHEN prev_us IS NULL OR us - prev_us > {GAP_US} THEN 1 ELSE 0 END AS is_new
  FROM t),
sessions AS (
  SELECT user_id, ts, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS session_id
  FROM flagged)
SELECT user_id, session_id,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       {sql_money_sum("value")} AS session_value
FROM sessions
GROUP BY user_id, session_id
""",
)
def stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-and-island sessionization (30-min gap): the batch-exact
    formulation. The streaming equivalent is `F.session_window` — parity
    (incl. the gap boundary rule) is pinned in tests/test_streaming.py."""
    e = table(spark, sf_dir, "events").withColumn("us", epoch_us("ts"))
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # event_id tie-break: with duplicate per-user microsecond timestamps the
    # cumulative sum is otherwise order-ambiguous and can diverge from the
    # oracle (both sides order by (us, event_id)).
    w_cum = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev = F.lag("us").over(w_seq)
    flagged = e.withColumn(
        "is_new",
        F.when(prev.isNull() | (F.col("us") - prev > GAP_US), F.lit(1)).otherwise(F.lit(0)),
    )
    sessions = flagged.withColumn("session_id", F.sum("is_new").over(w_cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(scaled_long(F.col("value"), 100)) / F.lit(100.0)).alias("session_value"),
    )


@query(
    "stream_watermark_dedup",
    oracle="""
SELECT event_type, COUNT(*) AS n_unique
FROM events
GROUP BY event_type
""",
)
def stream_watermark_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replay-dedup: the batch formulation doubles the input and dedups on
    event_id — surviving counts must equal the original stream. Streaming
    variant: withWatermark("ts","1 hour").dropDuplicates(["event_id"]) with
    state bounded by the watermark (tests/test_streaming.py)."""
    e = table(spark, sf_dir, "events").select("event_id", "event_type")
    doubled = e.unionByName(e)  # duplicate rows are bit-identical → any survivor ok
    return doubled.dropDuplicates(["event_id"]).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_unique")
    )


@query(
    "stream_late_data",
    oracle="""
WITH wm AS (SELECT max(ts) - INTERVAL 24 HOUR AS w FROM events)
SELECT (ts < wm.w) AS is_late,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users
FROM events, wm
GROUP BY is_late
""",
)
def stream_late_data(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-arrival policy (reference README.md:12): rows older than the
    watermark horizon are routed to a late-sink, not silently dropped. Batch
    formulation classifies against max(ts) − horizon via a broadcast scalar."""
    e = table(spark, sf_dir, "events")
    wm = e.agg((F.max("ts") - F.expr("INTERVAL 24 HOURS")).alias("w"))
    return (
        e.crossJoin(F.broadcast(wm))
        .groupBy((F.col("ts") < F.col("w")).alias("is_late"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "stream_join_static",
    oracle=f"""
SELECT c_mktsegment,
       COUNT(*) AS n_events,
       {sql_money_sum("value")} AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
)
def stream_join_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: in streaming the static dim broadcasts to
    every micro-batch — identical DataFrame code in both modes."""
    e = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    return (
        e.join(F.broadcast(c), F.col("user_id") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(scaled_long(F.col("value"), 100)) / F.lit(100.0)).alias("total_value"),
        )
    )


@query(
    "stream_stateful_running",
    oracle="""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS running_n,
       SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w / 100.0 AS running_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def stream_stateful_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running aggregates — the batch mirror of a stateful
    streaming groupBy in update mode."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("running_n"),
        (F.sum(scaled_long(F.col("value"), 100)).over(w) / F.lit(100.0)).alias(
            "running_value"
        ),
    )


# ---------------------------------------------------------------------------
# Structured Streaming runners (used by the parity smoke tests)
# ---------------------------------------------------------------------------


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the same parquet the batch path reads.
    Schema comes from a batch read (file streams require one); the
    legacy-nanos conversion mirrors sources/tables.py. The file source
    wants a directory, so the fixture file is symlinked into a scratch dir
    (read-only fixtures).

    `ts` is cast to the LTZ TimestampType here because Spark's watermark
    contract rejects TIMESTAMP_NTZ event-time columns
    (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) — streaming-only; batch outputs
    stay NTZ. The parity tests compare against the NTZ batch results, which
    is exact because both interpretations are naive wall-clock values."""
    import os
    import tempfile

    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    stream_dir = tempfile.mkdtemp(prefix="t20_stream_")
    os.symlink(os.path.abspath(path), os.path.join(stream_dir, "events.parquet"))
    df = spark.readStream.schema(schema).parquet(stream_dir)
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if dict(df.dtypes).get("ts") == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


@query(
    "stream_join_interval",
    oracle="""
SELECT c.user_id,
       c.event_id AS click_id,
       p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(c.ts) AS lag_us
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
""",
)
def stream_join_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (batch formulation): every purchase within
    one hour after a click by the same user — the attribution-join shape.
    The equi key (user_id) carries the shuffle; the time range is a residual
    predicate. In streaming (tests/test_streaming.py) both sides carry
    watermarks, which bound the join state to the interval + watermark
    horizon — the property that keeps state finite at 100 TB/day.
    """
    e = table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("c_ts")
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    return (
        c.join(
            p,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("c_ts"))
            & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select(
            "user_id",
            "click_id",
            "purchase_id",
            F.timestamp_diff("MICROSECOND", F.col("c_ts"), F.col("p_ts")).alias("lag_us"),
        )
    )


STATEFUL_OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATEFUL_STATE_SCHEMA = "cnt bigint, scaled bigint"


def _user_totals_fn(key, pdfs, state):
    """Per-user running totals with explicit GroupState: count + exact
    scaled-integer value sum (same floor(x*100+0.5) discipline as
    exprs.scaled_long, so totals are bit-stable across batch boundaries)."""
    import numpy as np
    import pandas as pd

    cnt, scaled = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        cnt += len(pdf)
        scaled += int(np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).sum())
    state.update((cnt, scaled))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [cnt], "total_value": [scaled / 100.0]}
    )


def stateful_user_totals(stream: DataFrame) -> DataFrame:
    """Custom stateful streaming operator (`applyInPandasWithState`): running
    per-user aggregates maintained in explicit keyed state — the escape hatch
    for semantics `groupBy().agg()` can't express (custom merge logic,
    early emission, per-key timeouts). State is one (cnt, scaled) pair per
    user: bounded by key cardinality, not stream length — the property that
    keeps this runnable forever at 100 TB/day. Batch parity is proven in
    tests/test_streaming.py against the exact-integer batch aggregation."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return stream.groupBy("user_id").applyInPandasWithState(
        _user_totals_fn,
        outputStructType=STATEFUL_OUTPUT_SCHEMA,
        stateStructType=STATEFUL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_resample_ohlc(stream: DataFrame) -> DataFrame:
    """Streaming face of batch `resample_time_bucket` (6-hour OHLC bars per
    event type). The row_number open/close picks become min_by/max_by over
    the composite (us, event_id) order key — declarative aggregates, so the
    whole bar is ONE streaming groupBy; run in complete mode (or append
    behind a watermark in production). Same exact-integer money sum as the
    batch face; parity is proven in tests/test_streaming.py."""
    e = stream.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        F.unix_micros("ts").alias("us"),  # stream ts is LTZ: unix_micros OK
    )
    key = F.struct("us", "event_id")
    return (
        e.groupBy("event_type", F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min_by("value", key).alias("open_value"),
            F.max("value").alias("high_value"),
            F.min("value").alias("low_value"),
            F.max_by("value", key).alias("close_value"),
            (F.sum(scaled_long(F.col("value"), 100)) / F.lit(100.0)).alias("sum_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("bucket_start"),
            "n_events",
            "open_value",
            "high_value",
            "low_value",
            "close_value",
            "sum_value",
        )
    )


ATTR_OUTPUT_SCHEMA = "user_id bigint, event_id bigint, channel bigint, value double"
ATTR_STATE_SCHEMA = "click_us bigint, click_channel bigint"
_ATTR_WINDOW_US_STREAM = 7 * 24 * 3600 * 1_000_000


def _last_touch_fn(key, pdfs, state):
    """Last-touch attribution kernel: keyed by user, the state is the last
    click's (epoch-us, channel) — one fixed-size pair per user, bounded by
    key cardinality exactly like stateful_user_totals. Within each batch
    rows replay in (us, kind, event_id) order (the batch window's composite
    key), so same-microsecond click+purchase resolves identically to the
    batch face; across batches the state carries the newest click forward
    (correct when micro-batches arrive in event-time order per user — the
    availableNow parity shape; late clicks are the batch face's job).

    Null tolerance matches the batch face's two last(ignorenulls) windows:
    a click whose props lack '"k": N' (channel null → pandas NaN) still
    advances click_us but leaves click_channel at the last non-null value
    (None if no channeled click yet), so an attributed purchase can emit a
    null channel exactly like the batch face — never a raised batch."""
    import pandas as pd

    click_us, click_channel = state.get if state.exists else (-1, None)
    out = {"user_id": [], "event_id": [], "channel": [], "value": []}
    rows = pd.concat(list(pdfs))
    rows = rows.sort_values(["us", "kind", "event_id"])
    for r in rows.itertuples():
        if r.kind == 0:
            click_us = int(r.us)
            if not pd.isna(r.channel):
                click_channel = int(r.channel)
        else:
            hit = click_us >= 0 and (r.us - click_us) <= _ATTR_WINDOW_US_STREAM
            out["user_id"].append(key[0])
            out["event_id"].append(r.event_id)
            out["channel"].append(click_channel if hit else -1)
            out["value"].append(r.value)
    state.update((click_us, click_channel))
    yield pd.DataFrame(out)


def stream_attribution_last_touch(stream: DataFrame) -> DataFrame:
    """Streaming face of batch `attribution_last_touch`: the union-log
    running-last-click window becomes explicit keyed state (last click us +
    channel per user), emitting each purchase's attributed channel as it
    arrives — the online shape of the same semantics. Downstream revenue
    rollup is an ordinary aggregation over this append stream. Parity with
    the batch face is proven in tests/test_streaming.py."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = stream.filter(
        F.col("event_type").isin("click", "purchase")
    ).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),  # stream ts is LTZ: unix_micros OK
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("kind"),
        (
            F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1).cast("long")
            % F.lit(5)
        ).alias("channel"),
        "value",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _last_touch_fn,
        outputStructType=ATTR_OUTPUT_SCHEMA,
        stateStructType=ATTR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_rolling_active_counts(stream: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Streaming faces of batch `rolling_active_users`: (dau, wau) streams.
    The batch trick ports directly — each (user, active-day) contributes to
    exactly 7 target days via a bounded explode, so the rolling distinct is
    a keyed dedup + count, never a range join. Streaming replaces the batch
    DISTINCT with the stateful dropDuplicates operator (state = one row per
    (user, day) / (user, target): bounded by activity grain, watermark-
    prunable in production); counts run in complete mode. The final
    DAU/WAU stickiness join is a 1-row-per-day batch step over these
    outputs (tests/test_streaming.py does it inline)."""
    daily = stream.select(
        "user_id", F.window("ts", "1 day").start.alias("day")
    )
    dau = (
        daily.dropDuplicates(["user_id", "day"])
        .groupBy("day")
        .agg(F.count(F.lit(1)).cast("long").alias("dau"))
    )
    wau = (
        daily.select(
            "user_id",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
            "day",
        )
        .select(
            "user_id",
            F.expr("timestampadd(DAY, i, day)").alias("target"),
        )
        .dropDuplicates(["user_id", "target"])
        .groupBy("target")
        .agg(F.count(F.lit(1)).cast("long").alias("wau"))
    )
    return dau, wau


def make_user_count_processor():
    """StatefulProcessor for `transformWithStateInPandas` — Spark 4's
    arbitrary-state API (typed state handles, timers, TTL) superseding
    applyInPandasWithState. Same running per-user totals as
    stateful_user_totals, expressed against the new API so both stateful
    surfaces are covered; parity is checked in tests/test_streaming.py.
    Built lazily (class definition touches pyspark.sql.streaming internals
    best imported under an active session)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserCountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cnt = handle.getValueState("cnt", "cnt bigint")

        def handleInputRows(self, key, rows, timerValues):
            cnt = self._cnt.get()[0] if self._cnt.exists() else 0
            for pdf in rows:
                cnt += len(pdf)
            self._cnt.update((cnt,))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [cnt]})

        def close(self) -> None:
            pass

    return UserCountProcessor()


def stateful_user_counts_tws(stream: DataFrame) -> DataFrame:
    """Per-user running counts via transformWithStateInPandas (RocksDB state
    store). State: one bigint per user — bounded by key cardinality.

    NOTE: this container lacks protobuf (the state-server wire protocol), so
    the parity test skips here and runs on any protobuf-equipped cluster;
    applyInPandasWithState (stateful_user_totals) is the fully-tested path
    in this environment."""
    return stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=make_user_count_processor(),
        outputStructType="user_id bigint, n_events bigint",
        outputMode="Update",
        timeMode="None",
    )


def run_available_now(df: DataFrame, query_name: str, output_mode: str = "complete"):
    """Drain a bounded stream into a memory sink and return the result DF."""
    q = (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return df.sparkSession.sql(f"SELECT * FROM {query_name}")


@query(
    "funnel_conversion",
    oracle="""
WITH s AS (
  SELECT user_id, MIN(ts) AS signup_ts
  FROM events WHERE event_type = 'signup' GROUP BY user_id),
c AS (
  SELECT e.user_id, MIN(e.ts) AS click_ts
  FROM events e JOIN s ON e.user_id = s.user_id
  WHERE e.event_type = 'click' AND e.ts > s.signup_ts
  GROUP BY e.user_id),
p AS (
  SELECT e.user_id, MIN(e.ts) AS purchase_ts
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
  GROUP BY e.user_id)
SELECT (SELECT COUNT(*) FROM s) AS n_signup,
       (SELECT COUNT(*) FROM c) AS n_click_after,
       (SELECT COUNT(*) FROM p) AS n_purchase_after
""",
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (signup → first later click → first later
    purchase) — the event-sequence analytic an activation dashboard runs.
    Each stage is a conditional MIN per user joined forward; three key-
    partitioned shuffles total, no window over the whole event history. At
    100 TB the stage joins stay key-local (same user_id partitioning reused)
    and the final counts are scalar aggregates.
    """
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_click_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


# ---------------------------------------------------------------------------
# Stateful streaming CUSUM (control-chart drift detection on a live stream)
# ---------------------------------------------------------------------------

CUSUM_OUTPUT_SCHEMA = (
    "event_type string, n_events bigint, final_cusum double, "
    "max_cusum double, n_alarms bigint"
)
CUSUM_STATE_SCHEMA = "s_c bigint, n bigint, max_c bigint, alarms bigint"


def make_cusum_fn(targets_c: dict, k_c: int = 2500, h_c: int = 20000):
    """Build the applyInPandasWithState kernel for streaming CUSUM. The
    per-type target mean μ (exact cents) is a CALIBRATION parameter — in a
    control chart μ comes from a reference period, not from the stream —
    which is exactly what lets the streaming op carry O(1) state per key:
    (current S, count, max S, alarm count). Rows are sorted by event time
    inside each micro-batch; across batches arrival order is stream order,
    the standard streaming contract."""

    def fn(key, pdfs, state):
        import numpy as np
        import pandas as pd

        if key[0] not in targets_c:
            # an uncalibrated event type must not kill the whole streaming
            # query with a KeyError — it simply isn't monitored until a
            # calibration target ships (control-chart practice: no target,
            # no chart). Drain the iterator and emit nothing.
            for _ in pdfs:
                pass
            return
        s_c, n, max_c, alarms = state.get if state.exists else (0, 0, 0, 0)
        mu = targets_c[key[0]]
        frames = [pdf for pdf in pdfs]
        pdf = pd.concat(frames).sort_values(["us", "event_id"])
        v_c = np.floor(pdf["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        for x in v_c:  # bounded by micro-batch size; state stays O(1)
            s_c = max(0, s_c + int(x) - mu - k_c)
            max_c = max(max_c, s_c)
            if s_c > h_c:
                alarms += 1
        n += len(v_c)
        state.update((s_c, n, max_c, alarms))
        yield pd.DataFrame(
            {
                "event_type": [key[0]],
                "n_events": [n],
                "final_cusum": [s_c / 100.0],
                "max_cusum": [max_c / 100.0],
                "n_alarms": [alarms],
            }
        )

    return fn


def stateful_cusum(stream: DataFrame, targets_c: dict) -> DataFrame:
    """Streaming face of operators/analytics.win_cusum_drift: one-sided
    CUSUM drift detection maintained in explicit keyed state. The batch
    operator proves the window identity (prefix-sum − running-min); this
    operator proves the same statistic is maintainable ON A LIVE STREAM
    with state bounded by |event types|, not stream length. Batch/stream
    parity is pinned in tests/test_streaming.py."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    prepared = stream.select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        "value",
    ).filter(
        # drop uncalibrated types BEFORE the shuffle — they would only be
        # drained inside the kernel; the in-kernel guard stays as the
        # belt for a target map that changes between plan and execution
        F.col("event_type").isin(*targets_c.keys())
        if targets_c
        else F.lit(False)
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        make_cusum_fn(targets_c),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
