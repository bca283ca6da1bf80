"""Window-function operators (SURVEY.md §2.E).

Reference parity: SCD2 history reconstruction and "historical analysis"
(reference README.md:6) are window-shaped — lag/lead derive effective date
ranges, row_number picks survivors, running aggregates serve the analysis
surface (README.md:10).

Determinism: every window ORDER BY ends in a unique tie-break key, and every
frame is stated explicitly — implicit frames differ between engines once ties
exist. Running/moving float sums use exact-integer cents (exprs.py).

Scale: a window over PARTITION BY k is one shuffle on k; the per-partition
sort spills gracefully. Skewed partition keys (one giant customer) are the
thing to watch at 100 TB — AQE does not split window skew, so pick partition
keys with bounded cardinality per key (or pre-bucket by key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import epoch_us, ntz_epoch, scaled_long
from ..registry import query
from ..sources.tables import table


@query(
    "win_row_number_topk",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 3
""",
)
def win_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k: rank-and-filter. Catalyst pushes the rn<=3 filter
    into the window sort (WindowGroupLimit) so each partition keeps 3 rows."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "win_rank_dense",
    oracle="""
SELECT o_orderkey, o_orderstatus, order_year,
       RANK()       OVER (PARTITION BY o_orderstatus ORDER BY order_year) AS rnk,
       DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY order_year) AS drnk,
       NTILE(4)     OVER (PARTITION BY o_orderstatus
                          ORDER BY order_year, o_orderkey) AS quartile
FROM (SELECT o_orderkey, o_orderstatus,
             CAST(year(o_orderdate) AS BIGINT) AS order_year
      FROM orders)
""",
)
def win_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.year("o_orderdate").cast("long").alias("order_year"),
    )
    w_ties = Window.partitionBy("o_orderstatus").orderBy("order_year")
    w_total = Window.partitionBy("o_orderstatus").orderBy("order_year", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        "order_year",
        F.rank().over(w_ties).alias("rnk"),
        F.dense_rank().over(w_ties).alias("drnk"),
        F.ntile(4).over(w_total).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       LAG(o_orderdate)  OVER w AS prev_order,
       LEAD(o_orderdate) OVER w AS next_order,
       date_diff('day', LAG(o_orderdate) OVER w, o_orderdate) AS days_since_prev
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def win_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over the (key, time) window — the SCD2 effective-date
    derivation primitive (reference README.md:6)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        prev.alias("prev_order"),
        F.lead("o_orderdate").over(w).alias("next_order"),
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("days_since_prev"),
    )


@query(
    "win_running_sum",
    oracle="""
SELECT o_custkey, o_orderkey, o_orderdate,
       SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
         AS running_spend
FROM orders
""",
)
def win_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (F.sum(scaled_long(F.col("o_totalprice"), 100)).over(w) / F.lit(100.0)).alias(
            "running_spend"
        ),
    )


@query(
    "win_moving_avg",
    oracle="""
SELECT event_id, user_id, ts,
       SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w
         / (100.0 * COUNT(*) OVER w) AS avg_7d
FROM (SELECT event_id, user_id, ts, value,
             CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec
      FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
""",
)
def win_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day event-time moving average via a RANGE frame on epoch seconds."""
    e = table(spark, sf_dir, "events").withColumn(
        "ts_sec", F.timestamp_diff("SECOND", ntz_epoch(), F.col("ts"))
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_sec")
        .rangeBetween(-6 * 86400, 0)
    )
    avg_7d = F.sum(scaled_long(F.col("value"), 100)).over(w) / (
        F.lit(100.0) * F.count(F.lit(1)).over(w)
    )
    return e.select("event_id", "user_id", "ts", avg_7d.alias("avg_7d"))


@query(
    "win_first_last",
    oracle="""
SELECT o_custkey, o_orderkey,
       FIRST_VALUE(o_orderstatus) OVER w AS first_status,
       LAST_VALUE(o_orderstatus)  OVER w AS latest_status,
       FIRST_VALUE(o_orderdate)   OVER w AS first_order_date,
       LAST_VALUE(o_orderdate)    OVER w AS latest_order_date
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
""",
)
def win_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last over an explicit full-partition frame — the Type-1
    latest-wins attribute resolution shape (reference README.md:6)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderstatus").over(w).alias("first_status"),
        F.last("o_orderstatus").over(w).alias("latest_status"),
        F.first("o_orderdate").over(w).alias("first_order_date"),
        F.last("o_orderdate").over(w).alias("latest_order_date"),
    )


@query(
    "win_gap_fill_calendar",
    oracle="""
WITH bounds AS (
  SELECT CAST(date_trunc('month', MIN(ts)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('day', MAX(ts)) AS TIMESTAMP) AS hi
  FROM events),
cal AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS day FROM bounds),
daily AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n
  FROM events WHERE event_type = 'purchase' GROUP BY day)
SELECT CAST(cal.day AS TIMESTAMP) AS day,
       COALESCE(daily.n, 0) AS n_purchases,
       (daily.n IS NULL) AS is_gap
FROM cal LEFT JOIN daily ON cal.day = daily.day
""",
)
def win_gap_fill_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar scaffolding / gap filling: left-join a generated day spine
    against sparse daily aggregates so missing days surface as explicit
    zero rows — the shape every time-series rollup needs before charting or
    window math. The spine is `sequence()` over the observed bounds
    (generated, never materialized driver-side); at 100 TB the spine is
    thousands of rows regardless of data size and broadcasts.
    """
    e = table(spark, sf_dir, "events")
    bounds = e.agg(
        F.date_trunc("month", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi"),
    )
    cal = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("day")
    )
    daily = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return cal.join(daily, "day", "left").select(
        "day",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_purchases"),
        F.col("n").isNull().alias("is_gap"),
    )


@query(
    "win_forward_fill",
    oracle="""
WITH sparse AS (
  SELECT user_id, event_id, ts,
         CASE WHEN value >= 1.0 THEN value END AS v
  FROM events),
filled AS (
  SELECT user_id, event_id,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
         v IS NULL AS was_gap
  FROM sparse)
SELECT user_id, event_id, v_filled, was_gap
FROM filled
""",
)
def win_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward fill (LOCF): carry the last observed value over gaps —
    `last_value(... ignore nulls)` with a running frame, the standard
    sensor/time-series repair. Gaps are injected deterministically (values
    < 1 nulled). One shuffle on the partition key; the frame is streaming,
    so state per key is O(1) regardless of history length — identical at
    100 TB.
    """
    e = table(spark, sf_dir, "events")
    sparse = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("value") >= 1.0, F.col("value")).alias("v"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return sparse.select(
        "user_id",
        "event_id",
        F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@query(
    "win_pct_change",
    oracle="""
WITH seq AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         lag(o_totalprice) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS prev_price
  FROM orders)
SELECT o_custkey, o_orderkey,
       round((o_totalprice - prev_price) / prev_price, 6) AS pct_change
FROM seq
WHERE prev_price IS NOT NULL
""",
)
def win_pct_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period percent change per key (lag + one identical float
    expression on both engines) — the order-to-order spend-delta analytic.
    First order per customer has no baseline and is excluded. One shuffle on
    the partition key; O(1) window state."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    seq = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
    )
    return seq.filter(F.col("prev_price").isNotNull()).select(
        "o_custkey",
        "o_orderkey",
        F.round(
            (F.col("o_totalprice") - F.col("prev_price")) / F.col("prev_price"), 6
        ).alias("pct_change"),
    )


@query(
    "win_range_interval",
    oracle="""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_7d,
       CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER w AS DOUBLE)
         / 100.0 AS sum_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
""",
)
def win_range_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time RANGE frame with a calendar INTERVAL bound — the native
    formulation of "last 7 days per user" (win_moving_avg shows the
    epoch-seconds encoding of the same idea; this one keeps the frame in
    time units, which also makes the peers-of-current-row semantics
    explicit under duplicate timestamps). The frame is value-based, so
    duplicate-ts rows share identical frames in both engines — no
    tiebreak needed; the sum is the exact scaled-integer discipline.
    One shuffle on user_id; frame evaluation is a per-partition sliding
    pointer, not a per-row rescan."""
    e = table(spark, sf_dir, "events")
    return e.selectExpr(
        "event_id",
        "user_id",
        "ts",
        """COUNT(*) OVER (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
           AS n_7d""",
        """SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) / 100.0D
           AS sum_7d""",
    )


@query(
    "win_running_distinct",
    oracle="""
WITH firsts AS (
  SELECT user_id, event_id, ts,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS is_first
  FROM events)
SELECT user_id, event_id, ts,
       CAST(SUM(is_first) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND CURRENT ROW) AS BIGINT)
         AS n_distinct_types_so_far
FROM firsts
""",
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over a window — which Spark (and SQL)
    cannot express directly — via the first-occurrence decomposition:
    mark each (user, event_type)'s first row with one window, then a
    running SUM of the marks gives the distinct-type count at every point
    in the stream. Two windows on the same user_id partitioning (one
    shuffle; the second window reuses the co-partitioned exchange), exact
    integers throughout — the standard idiom for "how many distinct
    things had this key seen by time t" at any scale."""
    e = table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    firsts = e.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias("is_first"),
    )
    return firsts.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("is_first").over(w_run).cast("long").alias("n_distinct_types_so_far"),
    )


@query(
    "win_ratio_to_report",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_returnflag,
         CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, l_returnflag,
       (price_c / (1.0 * SUM(price_c) OVER (PARTITION BY l_returnflag)))
         AS share_of_flag
FROM li
""",
)
def win_ratio_to_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each line item's share of its return flag's total
    revenue — the classic reporting window (percent-of-total) via a
    full-partition frame sum. Numerator and denominator are exact integer
    cents, so the single division is bit-identical in both engines; the
    plan is one keyed shuffle with no per-partition sort at all (no ORDER
    BY in the window), which is the cheapest window shape there is."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        scaled_long(F.col("l_extendedprice"), 100).alias("price_c"),
    )
    w = Window.partitionBy("l_returnflag")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        (F.col("price_c") / (F.lit(1.0) * F.sum("price_c").over(w))).alias(
            "share_of_flag"
        ),
    )


@query(
    "win_activity_streaks",
    oracle="""
WITH d AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day
  FROM events
),
i AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM d
),
s AS (
  SELECT user_id, island, COUNT(*) AS len,
         MIN(day) AS start_day, MAX(day) AS end_day
  FROM i GROUP BY user_id, island
)
SELECT user_id,
       COUNT(*) AS n_streaks,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(MAX(end_day - start_day + 1) AS BIGINT) AS longest_span_check
FROM s
GROUP BY user_id
""",
)
def win_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest run of consecutive active days per user — the
    gaps-and-islands idiom: for distinct active days, `day − row_number`
    is constant exactly within a consecutive run, so one window pass +
    one aggregation finds every streak with NO self-join and NO iteration
    (the naive formulations are O(n²) or sequential). All three stages
    key on user_id, so the log shuffles once; integer day arithmetic
    keeps the island key exact. The redundant longest_span_check column
    (= longest_streak by construction) is a built-in self-audit of the
    island invariant."""
    d = (
        table(spark, sf_dir, "events")
        .select(
            "user_id",
            F.floor(epoch_us("ts") / F.lit(86_400_000_000)).alias("day"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    i = d.select(
        "user_id", "day", (F.col("day") - F.row_number().over(w)).alias("island")
    )
    s = i.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("day").alias("start_day"),
        F.max("day").alias("end_day"),
    )
    return s.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
        F.max(F.col("end_day") - F.col("start_day") + 1)
        .cast("long")
        .alias("longest_span_check"),
    )
