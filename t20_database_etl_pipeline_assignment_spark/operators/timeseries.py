"""Time-series operators over the events stream (SURVEY.md §2.L extension;
reference README.md:10 "analysis" / README.md:4 incremental event loads):
tolerance-bounded as-of matching and fixed-interval resampling (OHLC bars).

Scale design (100 TB):
- The as-of join is NOT a join: both streams union into one ordered log and
  a single running `last(ignorenulls)` window per user recovers the latest
  prior match — one shuffle on user_id, no range fan-out, no per-row probe.
  This is the formulation that survives arbitrarily long histories.
- Resampling buckets by integer floor-division of epoch microseconds (exact
  in both engines), aggregates with one partial-agg shuffle, and picks
  open/close deterministically via composite-ordered row_number.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import (
    epoch_us,
    money_sum,
    ntz_from_us,
    scaled_long,
    sql_money_sum,
    sql_scaled_long,
    sql_spark_epoch_us,
)
from ..registry import query
from ..sources.tables import table

_TOL_US = 3_600_000_000  # 1 hour


@query(
    "join_asof_tolerance",
    oracle=f"""
WITH u AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
         CASE WHEN event_type = 'click' THEN event_id END AS click_id,
         CASE WHEN event_type = 'click' THEN epoch_us(ts) END AS click_us
  FROM events
  WHERE event_type IN ('click', 'purchase')
),
m AS (
  SELECT user_id, event_id, us, kind,
         last_value(click_id IGNORE NULLS) OVER w AS last_click_id,
         last_value(click_us IGNORE NULLS) OVER w AS last_click_us
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY us, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id,
       CASE WHEN us - last_click_us <= {_TOL_US} THEN last_click_id END AS click_id,
       CASE WHEN us - last_click_us <= {_TOL_US} THEN us - last_click_us END AS gap_us
FROM m
WHERE kind = 1
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of match with tolerance: each purchase is attributed to the same
    user's latest prior (or simultaneous) click, but only within 1 hour —
    otherwise unmatched (NULL). Implemented as a union + running
    `last(ignorenulls)` window instead of a range join: one shuffle on
    user_id, cost independent of history length, no candidate fan-out —
    the as-of formulation that scales to 100 TB event logs. Ordering is
    (us, kind, event_id) so clicks sort before purchases at equal
    timestamps and duplicate timestamps break ties deterministically."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    return asof_attribute(
        e.select("user_id", "event_id", "event_type", epoch_us("ts").alias("us")),
        tol_us=_TOL_US,
    )


def asof_attribute(e: DataFrame, tol_us: int = _TOL_US) -> DataFrame:
    """The as-of kernel: input (user_id, event_id, event_type, us); output
    one row per purchase with its attributed click (or NULLs). Separated
    from the fixture scan so tests can model-check it on generated data."""
    is_click = F.col("event_type") == "click"
    u = e.select(
        "user_id",
        "event_id",
        "us",
        F.when(is_click, 0).otherwise(1).alias("kind"),
        F.when(is_click, F.col("event_id")).alias("click_id"),
        F.when(is_click, F.col("us")).alias("click_us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = u.select(
        "user_id",
        "event_id",
        "us",
        "kind",
        F.last("click_id", ignorenulls=True).over(w).alias("last_click_id"),
        F.last("click_us", ignorenulls=True).over(w).alias("last_click_us"),
    )
    within = (F.col("us") - F.col("last_click_us")) <= tol_us
    return m.filter(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        F.when(within, F.col("last_click_id")).alias("click_id"),
        F.when(within, F.col("us") - F.col("last_click_us")).alias("gap_us"),
    )


_BUCKET_US = 21_600_000_000  # 6 hours


@query(
    "resample_time_bucket",
    oracle=f"""
WITH e AS (
  SELECT event_type, event_id, value, epoch_us(ts) AS us,
         epoch_us(ts) // {_BUCKET_US} AS bucket
  FROM events
),
r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                            ORDER BY us ASC, event_id ASC) AS rn_a,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                            ORDER BY us DESC, event_id DESC) AS rn_d
  FROM e
)
SELECT event_type,
       CAST(to_timestamp((bucket * {_BUCKET_US}) / 1000000) AS TIMESTAMP) AS bucket_start,
       COUNT(*) AS n_events,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open_value,
       MAX(value) AS high_value,
       MIN(value) AS low_value,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close_value,
       {sql_money_sum("value")} AS sum_value
FROM r
GROUP BY event_type, bucket
""",
)
def resample_time_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-interval resampling: 6-hour OHLC-style bars per event type
    (open/high/low/close/sum/count). Buckets come from exact integer
    floor-division of epoch microseconds; open/close are picked by
    composite-ordered row_number (us, event_id) so duplicate timestamps
    resolve identically in both engines; the money sum is exact-integer.
    One window + one partial-agg shuffle on (event_type, bucket) — at
    100 TB the bucket key is also the natural write-partitioning, so this
    pipeline runs shuffle-co-located end to end."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "value",
        epoch_us("ts").alias("us"),
        F.expr(f"({sql_spark_epoch_us('ts')}) div {_BUCKET_US}").alias("bucket"),
    )
    wa = Window.partitionBy("event_type", "bucket").orderBy(
        F.asc("us"), F.asc("event_id")
    )
    wd = Window.partitionBy("event_type", "bucket").orderBy(
        F.desc("us"), F.desc("event_id")
    )
    r = e.select(
        "*",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return r.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open_value"),
        F.max("value").alias("high_value"),
        F.min("value").alias("low_value"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close_value"),
        money_sum(F.col("value")).alias("sum_value"),
    ).select(
        "event_type",
        ntz_from_us(F.col("bucket") * _BUCKET_US).alias("bucket_start"),
        "n_events",
        "open_value",
        "high_value",
        "low_value",
        "close_value",
        "sum_value",
    )


@query(
    "agg_heavy_hitters",
    oracle="""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS word FROM documents
),
counts AS (SELECT word, COUNT(*) AS n FROM tok GROUP BY word),
total AS (SELECT SUM(n) AS t FROM counts)
SELECT word, n, n / (1.0 * t) AS frac
FROM counts, total
WHERE n >= 0.02 * t
""",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters: tokens accounting for ≥ 2% of all token occurrences.
    Token counts partial-aggregate map-side (one shuffle over the distinct
    vocabulary, not the corpus); the grand total is a 1-row scalar
    broadcast back over the counts. This threshold-based formulation is the
    deterministic face of frequent-items sketches: at 100 TB the counts
    table is the same dataflow a count-min/space-saving candidate pass
    produces, with an exact recount of candidates — output identical."""
    d = table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(F.sum("n").alias("t"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("n") >= 0.02 * F.col("t"))
        .select("word", "n", (F.col("n") / (1.0 * F.col("t"))).alias("frac"))
    )


_WEEK_US = 7 * 86_400_000_000


@query(
    "cohort_retention",
    oracle=f"""
WITH act AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
  FROM events),
cohort AS (
  SELECT user_id, MIN(week) AS cohort_week FROM act GROUP BY user_id),
ret AS (
  SELECT c.cohort_week,
         (epoch_us(a.week) - epoch_us(c.cohort_week)) // {_WEEK_US} AS week_offset,
         COUNT(DISTINCT a.user_id) AS n_users
  FROM act a JOIN cohort c ON a.user_id = c.user_id
  GROUP BY 1, 2),
base AS (
  SELECT cohort_week, n_users AS cohort_size FROM ret WHERE week_offset = 0)
SELECT r.cohort_week, r.week_offset, r.n_users,
       r.n_users / (1.0 * b.cohort_size) AS retention
FROM ret r JOIN base b ON r.cohort_week = b.cohort_week
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-active week, then
    the fraction still active N weeks later — the canonical engagement
    analytic. Dataflow is user-keyed end to end: distinct (user, week) and
    the per-user cohort both shuffle on user_id (co-located join), the
    retention aggregate shuffles on the tiny (cohort, offset) key, and
    cohort sizes broadcast back for the ratio. No window functions, no
    self-join of the event log — at 100 TB the only big shuffle is the
    initial distinct."""
    e = table(spark, sf_dir, "events")
    act = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    cohort = act.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    ret = (
        act.join(cohort, "user_id")
        .select(
            "cohort_week",
            (
                F.timestamp_diff("MICROSECOND", F.col("cohort_week"), F.col("week"))
                / F.lit(_WEEK_US)
            ).cast("long").alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    base = ret.filter(F.col("week_offset") == 0).select(
        "cohort_week", F.col("n_users").alias("cohort_size")
    )
    return ret.join(F.broadcast(base), "cohort_week").select(
        "cohort_week",
        "week_offset",
        "n_users",
        (F.col("n_users") / (1.0 * F.col("cohort_size"))).alias("retention"),
    )


_IV_DUR_US = 3_600_000_000  # each event opens a 1-hour interval


@query(
    "interval_peak_concurrency",
    oracle=f"""
WITH iv AS (
  SELECT event_id, event_type, epoch_us(ts) AS s,
         epoch_us(ts) + {_IV_DUR_US} AS e
  FROM events),
pts AS (
  SELECT event_type, s AS t, 1 AS delta, event_id FROM iv
  UNION ALL
  SELECT event_type, e AS t, -1 AS delta, event_id FROM iv),
run AS (
  SELECT event_type, t,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS conc
  FROM pts),
mx AS (SELECT event_type, MAX(conc) AS peak FROM run GROUP BY event_type)
SELECT r.event_type, CAST(m.peak AS BIGINT) AS peak_concurrency,
       CAST(MIN(r.t) AS BIGINT) AS peak_at_us
FROM run r JOIN mx m ON r.event_type = m.event_type AND r.conc = m.peak
GROUP BY r.event_type, m.peak
""",
)
def interval_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak interval concurrency via sweep line: every event opens a 1-hour
    interval; the answer is the maximum number of simultaneously open
    intervals per event_type and the earliest instant it is reached.

    The naive formulation is an interval-overlap self-join — O(n²) pairs
    and unbound fan-out. The sweep line instead emits a +1 point at each
    start and a -1 point at each end, sorts once, and takes a running sum:
    the concurrency curve in one hash-partitioned window pass. End points
    sort before start points at the same instant (delta ascending) so
    half-open [s, e) semantics hold; event_id breaks remaining ties so the
    curve is engine-identical. At 100 TB a single hot key still sorts in
    one task's range only if further split: the same curve composes by
    range-chunking time, prefix-summing per chunk, and broadcasting chunk
    offsets — the semantics permit it because the sum is associative."""
    e = table(spark, sf_dir, "events").select(
        "event_id", "event_type", epoch_us("ts").alias("s")
    )
    pts = e.select(
        "event_type", F.col("s").alias("t"), F.lit(1).alias("delta"), "event_id"
    ).unionByName(
        e.select(
            "event_type",
            (F.col("s") + F.lit(_IV_DUR_US)).alias("t"),
            F.lit(-1).alias("delta"),
            "event_id",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("t", "delta", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = pts.select("event_type", "t", F.sum("delta").over(w).alias("conc"))
    mx = run.groupBy("event_type").agg(F.max("conc").alias("peak"))
    return (
        run.join(F.broadcast(mx), "event_type")
        .filter(F.col("conc") == F.col("peak"))
        .groupBy("event_type", "peak")
        .agg(F.min("t").alias("peak_at_us"))
        .select(
            "event_type",
            F.col("peak").cast("long").alias("peak_concurrency"),
            F.col("peak_at_us").cast("long"),
        )
    )


@query(
    "event_transition_matrix",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type, ts, event_id,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events)
SELECT event_type AS from_type, next_type AS to_type,
       COUNT(*) AS n_transitions,
       COUNT(*) / (1.0 * SUM(COUNT(*)) OVER (PARTITION BY event_type))
         AS p_next
FROM seq WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order behavioral Markov matrix: for each user-stream
    transition A→B, the count and the conditional probability P(B | A) —
    the sequence-mining summary behind next-action prediction and anomaly
    screens (a transition whose probability collapses week-over-week is a
    funnel break).

    One lag window partitioned on user_id (the stream's natural key), one
    partial-aggregable count on the tiny (from, to) key, and the
    normalizing row-total as a window over the |types|² result — nothing
    larger than the type-pair matrix ever shuffles twice. The probability
    is one float division of exact integer counts, identical in both
    engines."""
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    w_tot = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions")
            / (F.lit(1.0) * F.sum("n_transitions").over(w_tot))
        ).alias("p_next"),
    )


# ---------------------------------------------------------------------------
# attribution_last_touch
# ---------------------------------------------------------------------------

_ATTR_WINDOW_US = 7 * 86_400_000_000  # 7-day attribution window


@query(
    "attribution_last_touch",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS kind,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 5 AS channel,
         value
  FROM events WHERE event_type IN ('click', 'purchase')),
seq AS (
  SELECT *,
         LAST_VALUE(CASE WHEN kind = 0 THEN us END IGNORE NULLS) OVER w
           AS click_us,
         LAST_VALUE(CASE WHEN kind = 0 THEN channel END IGNORE NULLS) OVER w
           AS click_channel
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY us, kind, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT CASE WHEN click_us IS NOT NULL AND us - click_us <= {_ATTR_WINDOW_US}
            THEN click_channel ELSE -1 END AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       {sql_money_sum("value")} AS revenue
FROM seq WHERE kind = 1
GROUP BY 1
""",
)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: every purchase credits the same
    user's most recent click within a 7-day window (channel = the click's
    campaign id parsed from props, k mod 5); purchases with no qualifying
    click land in channel -1 so totals reconcile. Revenue is the exact
    integer-cents sum.

    Scale shape (same family as join_asof_tolerance): clicks and purchases
    union into ONE ordered log and a single running last(ignorenulls)
    window per user recovers the latest prior click — one shuffle on
    user_id, no range join, no per-purchase probe, histories of any length.
    Same-microsecond click+purchase resolves deterministically (kind sorts
    clicks first, event_id breaks exact ties) in both engines."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    base = e.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("us"),
        F.when(F.col("event_type") == "click", F.lit(0)).otherwise(F.lit(1)).alias("kind"),
        (
            F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1).cast("long")
            % F.lit(5)
        ).alias("channel"),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = base.select(
        "*",
        F.last(F.when(F.col("kind") == 0, F.col("us")), ignorenulls=True)
        .over(w)
        .alias("click_us"),
        F.last(F.when(F.col("kind") == 0, F.col("channel")), ignorenulls=True)
        .over(w)
        .alias("click_channel"),
    )
    return (
        seq.filter(F.col("kind") == 1)
        .select(
            F.when(
                F.col("click_us").isNotNull()
                & ((F.col("us") - F.col("click_us")) <= _ATTR_WINDOW_US),
                F.col("click_channel"),
            )
            .otherwise(F.lit(-1))
            .alias("channel"),
            "value",
        )
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            money_sum(F.col("value")).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# cohort_ltv_cumulative
# ---------------------------------------------------------------------------


@query(
    "cohort_ltv_cumulative",
    oracle=f"""
WITH o AS (
  SELECT o_custkey,
         CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
         {sql_scaled_long("o_totalprice", 100)} AS cents
  FROM orders),
cohort AS (SELECT o_custkey, MIN(m) AS cm FROM o GROUP BY 1),
sizes AS (SELECT cm, COUNT(*) AS cohort_size FROM cohort GROUP BY 1),
rev AS (
  SELECT c.cm AS cohort_month,
         CAST(12 * (year(o.m) - year(c.cm)) + (month(o.m) - month(c.cm))
              AS BIGINT) AS month_offset,
         SUM(o.cents) AS rev_cents
  FROM o JOIN cohort c ON o.o_custkey = c.o_custkey
  GROUP BY 1, 2)
SELECT r.cohort_month, r.month_offset, s.cohort_size,
       CAST(SUM(r.rev_cents) OVER (PARTITION BY r.cohort_month
                                   ORDER BY r.month_offset) AS BIGINT)
         / 100.0 AS ltv_cum,
       CAST(SUM(r.rev_cents) OVER (PARTITION BY r.cohort_month
                                   ORDER BY r.month_offset) AS BIGINT)
         / (100.0 * s.cohort_size) AS ltv_cum_per_customer
FROM rev r JOIN sizes s ON r.cohort_month = s.cm
""",
)
def cohort_ltv_cumulative(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative cohort LTV: customers grouped by first-order month, then
    cumulative revenue (total and per cohort member) by month offset — the
    curve a growth team reads payback periods off. Offsets are pure integer
    calendar arithmetic and revenue is exact integer cents, so the running
    sums are bit-identical in both engines; the only float ops are the two
    final divisions of the same integers.

    Scale: orders and per-customer cohorts shuffle once on o_custkey
    (co-located join), the offset rollup shuffles the tiny (cohort, offset)
    key, the cumulative window runs inside each cohort partition, and
    cohort sizes broadcast back. The event log itself is never windowed."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        scaled_long(F.col("o_totalprice"), 100).alias("cents"),
    )
    cohort = o.groupBy("o_custkey").agg(F.min("m").alias("cm"))
    sizes = cohort.groupBy("cm").agg(F.count(F.lit(1)).alias("cohort_size"))
    rev = (
        o.join(cohort, "o_custkey")
        .groupBy(
            F.col("cm").alias("cohort_month"),
            (
                F.lit(12) * (F.year("m") - F.year("cm"))
                + (F.month("m") - F.month("cm"))
            )
            .cast("long")
            .alias("month_offset"),
        )
        .agg(F.sum("cents").alias("rev_cents"))
    )
    w = (
        Window.partitionBy("cohort_month")
        .orderBy("month_offset")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        rev.join(
            F.broadcast(sizes), rev["cohort_month"] == sizes["cm"]
        )
        .select(
            "cohort_month",
            "month_offset",
            "cohort_size",
            (F.sum("rev_cents").over(w).cast("long") / F.lit(100.0)).alias("ltv_cum"),
            (
                F.sum("rev_cents").over(w).cast("long")
                / (F.lit(100.0) * F.col("cohort_size"))
            ).alias("ltv_cum_per_customer"),
        )
    )


# ---------------------------------------------------------------------------
# rolling_active_users — trailing-window DAU/WAU engagement
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@query(
    "rolling_active_users",
    oracle=f"""
WITH daily AS (
  SELECT DISTINCT user_id, epoch_us(date_trunc('day', ts)) // {_DAY_US} AS d
  FROM events),
days AS (SELECT DISTINCT d FROM daily),
contrib AS (
  SELECT DISTINCT da.user_id, da.d + i AS target
  FROM daily da CROSS JOIN unnest(range(0, 7)) AS t(i)),
wau AS (
  SELECT c.target AS d, COUNT(DISTINCT c.user_id) AS wau
  FROM contrib c JOIN days dy ON c.target = dy.d
  GROUP BY 1),
dau AS (SELECT d, COUNT(*) AS dau FROM daily GROUP BY d)
SELECT CAST(to_timestamp((dau.d * {_DAY_US}) / 1000000) AS TIMESTAMP) AS day,
       CAST(dau.dau AS BIGINT) AS dau,
       CAST(wau.wau AS BIGINT) AS wau,
       dau.dau / (1.0 * wau.wau) AS stickiness
FROM dau JOIN wau ON dau.d = wau.d
""",
)
def rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day engagement: per active day, DAU, WAU (distinct users
    active in the trailing 7 days), and the DAU/WAU stickiness ratio.

    The trailing window is NOT a range join: each (user, day) contributes
    to exactly 7 target days via a bounded explode, turning the rolling
    distinct into an equi-keyed distinct + count — partial-aggregable,
    co-partitioned, and linear in activity rows at any history length
    (the standard rolling-distinct formulation when exact counts are
    required; the sketch tier swaps count_distinct for HLL union). The
    stickiness division is int/int in both engines."""
    e = table(spark, sf_dir, "events")
    day_us = sql_spark_epoch_us("date_trunc('day', ts)")
    daily = e.select(
        "user_id",
        F.expr(f"({day_us}) div {_DAY_US}").alias("d"),
    ).distinct()
    days = daily.select("d").distinct()
    contrib = (
        daily.select(
            "user_id",
            "d",
            F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        )
        .select("user_id", (F.col("d") + F.col("i")).alias("target"))
        .distinct()
        .join(days.withColumnRenamed("d", "target"), "target")
    )
    wau = contrib.groupBy(F.col("target").alias("d")).agg(
        F.count_distinct("user_id").alias("wau")
    )
    dau = daily.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    return dau.join(wau, "d").select(
        ntz_from_us(F.col("d") * _DAY_US).alias("day"),
        F.col("dau").cast("long").alias("dau"),
        F.col("wau").cast("long").alias("wau"),
        (F.col("dau") / (F.lit(1.0) * F.col("wau"))).alias("stickiness"),
    )


# ---------------------------------------------------------------------------
# user_lifecycle_weekly — growth accounting (new/retained/resurrected/churned)
# ---------------------------------------------------------------------------


@query(
    "user_lifecycle_weekly",
    oracle=f"""
WITH act AS (
  SELECT DISTINCT user_id, epoch_us(date_trunc('week', ts)) // {_WEEK_US} AS wk
  FROM events),
bounds AS (SELECT MAX(wk) AS max_wk FROM act),
seq AS (
  SELECT user_id, wk,
         LAG(wk)  OVER (PARTITION BY user_id ORDER BY wk) AS prev_wk,
         LEAD(wk) OVER (PARTITION BY user_id ORDER BY wk) AS next_wk
  FROM act),
states AS (
  SELECT wk,
         CASE WHEN prev_wk IS NULL THEN 'new'
              WHEN wk - prev_wk = 1 THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM seq),
churn AS (
  SELECT s.wk + 1 AS wk, 'churned' AS state
  FROM seq s, bounds b
  WHERE (s.next_wk IS NULL AND s.wk < b.max_wk) OR s.next_wk - s.wk > 1),
allrows AS (SELECT wk, state FROM states UNION ALL SELECT wk, state FROM churn)
-- reconstruct the true Monday week boundary: the epoch (1970-01-01) was a
-- Thursday, so every date_trunc('week') Monday sits 4 days past an exact
-- epoch-week multiple and the floor drops exactly that remainder
SELECT CAST(to_timestamp((wk * {_WEEK_US} + 4 * 86400000000) / 1000000)
            AS TIMESTAMP) AS week,
       CAST(SUM(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
       CAST(SUM(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected,
       CAST(SUM(CASE WHEN state = 'churned' THEN 1 ELSE 0 END) AS BIGINT) AS n_churned
FROM allrows
GROUP BY wk
""",
)
def user_lifecycle_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: per week, how many users are new (first-ever
    activity), retained (active previous week too), resurrected (returning
    after a gap), and churned (active previous week, absent this week —
    attributed to the week the user went missing, bounded by the last
    observed week so the open frontier never counts as churn).

    Weeks are exact integer indexes (epoch_us // week), so every state
    test is pure integer algebra — bit-identical across engines. One
    user-keyed window over the distinct (user, week) activity relation
    derives all four states (lag for new/retained/resurrected, lead for
    churn events); the final rollup shuffles only (week, state) counts.
    The global max week is a 1-row broadcast (reviewed BNLJ)."""
    e = table(spark, sf_dir, "events")
    week_us = sql_spark_epoch_us("date_trunc('week', ts)")
    act = e.select(
        "user_id",
        F.expr(f"({week_us}) div {_WEEK_US}").alias("wk"),
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("wk")
    seq = act.select(
        "user_id",
        "wk",
        F.lag("wk").over(w).alias("prev_wk"),
        F.lead("wk").over(w).alias("next_wk"),
    )
    states = seq.select(
        "wk",
        F.when(F.col("prev_wk").isNull(), F.lit("new"))
        .when(F.col("wk") - F.col("prev_wk") == 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("state"),
    )
    bounds = act.agg(F.max("wk").alias("max_wk"))
    churn = (
        seq.crossJoin(F.broadcast(bounds))
        .filter(
            (F.col("next_wk").isNull() & (F.col("wk") < F.col("max_wk")))
            | (F.col("next_wk") - F.col("wk") > 1)
        )
        .select((F.col("wk") + 1).alias("wk"), F.lit("churned").alias("state"))
    )
    allrows = states.unionByName(churn)
    return allrows.groupBy("wk").agg(
        F.sum(F.when(F.col("state") == "new", 1).otherwise(0)).cast("long").alias("n_new"),
        F.sum(F.when(F.col("state") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("state") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
        F.sum(F.when(F.col("state") == "churned", 1).otherwise(0))
        .cast("long")
        .alias("n_churned"),
    ).select(
        # +4 days: reconstruct the Monday the week index truncated from
        # (the epoch was a Thursday) — see the oracle comment
        ntz_from_us(F.col("wk") * _WEEK_US + 4 * 86_400_000_000).alias("week"),
        "n_new",
        "n_retained",
        "n_resurrected",
        "n_churned",
    )


# ---------------------------------------------------------------------------
# time_to_conversion — forward as-of latency per campaign channel
# ---------------------------------------------------------------------------

_CONV_WINDOW_US = 3 * 86_400_000_000  # 3-day conversion window


@query(
    "time_to_conversion",
    oracle=f"""
WITH base AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CASE WHEN event_type = 'purchase' THEN 0 ELSE 1 END AS kind,
         CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT) % 5 AS channel
  FROM events WHERE event_type IN ('click', 'purchase')),
seq AS (
  SELECT *,
         LAST_VALUE(CASE WHEN kind = 0 THEN us END IGNORE NULLS) OVER w
           AS next_purchase_us
  FROM base
  WINDOW w AS (PARTITION BY user_id ORDER BY us DESC, kind ASC, event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
clicks AS (
  SELECT channel,
         next_purchase_us IS NOT NULL
           AND next_purchase_us - us <= {_CONV_WINDOW_US} AS converted,
         next_purchase_us - us AS latency_us
  FROM seq WHERE kind = 1)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       CAST(SUM(CASE WHEN converted THEN 1 ELSE 0 END) AS BIGINT) AS n_converted,
       CAST(SUM(CASE WHEN converted THEN latency_us ELSE 0 END) AS BIGINT)
         AS sum_latency_us,
       MAX(CASE WHEN converted THEN latency_us END) AS max_latency_us
FROM clicks
GROUP BY channel
""",
)
def time_to_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of conversion latency: for every click, the same user's
    NEXT purchase at-or-after it; per campaign channel, click count,
    conversions inside a 3-day window, and exact integer latency sums —
    the attribution_last_touch mirror image (forward instead of backward).

    Same union-log shape: one window per user traversed in REVERSE event
    order, so a running last(ignorenulls) of purchases yields each
    click's next purchase — one shuffle, no range join, no per-click
    probe. Same-microsecond purchase+click pairs resolve deterministically
    (purchase sorts first in the reverse traversal, event_id breaks exact
    ties) in both engines; every output metric is integer."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    base = e.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("us"),
        F.when(F.col("event_type") == "purchase", F.lit(0))
        .otherwise(F.lit(1))
        .alias("kind"),
        (
            F.regexp_extract(F.col("props"), '"k": ([0-9]+)', 1).cast("long")
            % F.lit(5)
        ).alias("channel"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("us"), F.asc("kind"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = base.select(
        "*",
        F.last(F.when(F.col("kind") == 0, F.col("us")), ignorenulls=True)
        .over(w)
        .alias("next_purchase_us"),
    )
    clicks = seq.filter(F.col("kind") == 1).select(
        "channel",
        (
            F.col("next_purchase_us").isNotNull()
            & ((F.col("next_purchase_us") - F.col("us")) <= _CONV_WINDOW_US)
        ).alias("converted"),
        (F.col("next_purchase_us") - F.col("us")).alias("latency_us"),
    )
    return clicks.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_clicks"),
        F.sum(F.when(F.col("converted"), 1).otherwise(0))
        .cast("long")
        .alias("n_converted"),
        F.sum(F.when(F.col("converted"), F.col("latency_us")).otherwise(0))
        .cast("long")
        .alias("sum_latency_us"),
        F.max(F.when(F.col("converted"), F.col("latency_us"))).alias("max_latency_us"),
    )
