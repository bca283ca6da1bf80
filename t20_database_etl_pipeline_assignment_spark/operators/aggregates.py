"""Aggregation operators (SURVEY.md §2.D) — the "querying and analysis"
surface the reference loads its warehouse for (reference README.md:10).

All float aggregates use exact-integer arithmetic (exprs.py) so Spark's
parallel partial-aggregation order can never produce different bits from the
single-threaded DuckDB oracle. At 100 TB the same property means no
precision drift across billions of rows, and every groupBy below does
map-side partial aggregation before its shuffle (hash agg on low-cardinality
keys — verified HashAggregate pairs in .explain()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import money_avg, money_sum, scaled_long, sql_money_avg, sql_money_sum
from ..registry import query
from ..sources.tables import table


@query(
    "agg_hash_group",
    oracle=f"""
SELECT l_returnflag,
       l_linestatus,
       {sql_money_sum("l_quantity")} AS sum_qty,
       {sql_money_sum("l_extendedprice")} AS sum_base_price,
       {sql_money_sum("l_extendedprice * (1 - l_discount)", 10000)} AS sum_disc_price,
       {sql_money_sum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", 1000000)} AS sum_charge,
       {sql_money_avg("l_quantity")} AS avg_qty,
       {sql_money_avg("l_extendedprice")} AS avg_price,
       {sql_money_avg("l_discount")} AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-01'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_hash_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical wide hash aggregation."""
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    charge = disc_price * (F.lit(1) + F.col("l_tax"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        money_sum(F.col("l_quantity")).alias("sum_qty"),
        money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        money_sum(disc_price, 10000).alias("sum_disc_price"),
        money_sum(charge, 1000000).alias("sum_charge"),
        money_avg(F.col("l_quantity")).alias("avg_qty"),
        money_avg(F.col("l_extendedprice")).alias("avg_price"),
        money_avg(F.col("l_discount")).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "agg_count_distinct",
    oracle="""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations
FROM customer
GROUP BY c_mktsegment
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.countDistinct("c_nationkey").alias("n_nations"),
    )


@query(
    "agg_approx_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events,
       TRUE AS hll_within_5pct
FROM events
GROUP BY event_type
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct: the 100 TB substitute for exact COUNT(DISTINCT) —
    mergeable sketches, no second shuffle, bounded memory per group.

    Driver-facing columns are exact (the sketch value itself is
    engine-specific); the sketch is still computed and asserted inline
    against the exact count via the hll_within_5pct guarantee column, so a
    broken HLL path turns the row red. rsd-accuracy is also property-tested
    in tests/test_llm_ops.py.

    The HLL and the exact distinct run as SEPARATE aggregations joined on
    the 5-row result: mixing them in one agg makes Spark's distinct-agg
    rewrite carry a partial HLL sketch per (event_type, user_id) group —
    at rsd 0.01 that is ~10 KB of registers per DISTINCT USER, millions of
    sketches where five suffice (measured 3.1 s → 1.3 s at sf0.1; at
    100 TB it is the difference between working and OOM)."""
    e = table(spark, sf_dir, "events").select("event_type", "user_id")
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    approx = e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("hll")
    )
    return exact.join(approx, "event_type").select(
        "event_type",
        "n_users",
        "n_events",
        (F.abs(F.col("hll") - F.col("n_users")) <= F.lit(0.05) * F.col("n_users")).alias(
            "hll_within_5pct"
        ),
    )


@query(
    "agg_having",
    oracle=f"""
SELECT o_custkey, {sql_money_sum("o_totalprice")} AS total_spent,
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING {sql_money_sum("o_totalprice")} > 1000000.0
""",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            money_sum(F.col("o_totalprice")).alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .filter(F.col("total_spent") > 1000000.0)
    )


@query(
    "agg_rollup",
    oracle=f"""
SELECT r_name, n_name,
       COUNT(*) AS n_customers,
       {sql_money_sum("c_acctbal")} AS total_bal
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            money_sum(F.col("c_acctbal")).alias("total_bal"),
        )
    )


@query(
    "agg_cube",
    oracle=f"""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n_orders,
       {sql_money_sum("o_totalprice")} AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total"),
    )


@query(
    "agg_grouping_sets",
    oracle=f"""
SELECT c_mktsegment, c_nationkey,
       COUNT(*) AS n,
       {sql_money_sum("c_acctbal")} AS total_bal
FROM customer
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    c.createOrReplaceTempView("t20_customer_gs")
    return spark.sql(
        """
SELECT c_mktsegment, c_nationkey,
       COUNT(*) AS n,
       SUM(CAST(FLOOR(c_acctbal * 100 + 0.5D) AS BIGINT)) / 100.0D AS total_bal
FROM t20_customer_gs
GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey), ())
"""
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "agg_pivot",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events
GROUP BY user_id
""",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list: no extra distinct-values job, and
    a stable output schema — both required at scale and for the oracle."""
    e = table(spark, sf_dir, "events")
    piv = e.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count().na.fill(0)
    return piv.select(
        "user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES]
    )


@query(
    "agg_conditional",
    oracle="""
SELECT n_name,
       SUM(CASE WHEN o_orderpriority = '1-URGENT'
                THEN CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)
                ELSE 0 END) / 100.0 AS urgent_total,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_finished
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    urgent_cents = F.when(
        F.col("o_orderpriority") == "1-URGENT",
        scaled_long(F.col("o_totalprice"), 100),
    ).otherwise(F.lit(0))
    return (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (F.sum(urgent_cents) / F.lit(100.0)).alias("urgent_total"),
            F.count(F.when(F.col("o_orderstatus") == "F", F.lit(1))).alias("n_finished"),
        )
    )


@query(
    "agg_collect_sorted",
    oracle="""
SELECT r_name,
       array_to_string(list_sort(list(n_name)), ',') AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""",
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is unordered by contract → wrap in sort_array and render
    as a string for a deterministic, hashable value (SURVEY.md §2 preamble)."""
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"))
    )


@query(
    "agg_median_percentile",
    oracle="""
SELECT l_returnflag,
       quantile_cont(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT), 0.25) / 100.0 AS q1,
       quantile_cont(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT), 0.50) / 100.0 AS med,
       quantile_cont(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT), 0.75) / 100.0 AS q3
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_median_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (q1/median/q3) per group.

    Cross-engine determinism: percentiles run over the scaled-integer
    representation — interpolation at dyadic fractions (.25/.5/.75) between
    integers is exact in IEEE double regardless of which a+(b-a)*f formula
    an engine uses, so Spark and DuckDB agree bitwise; the final /100 is one
    identical float op. At 100 TB exact percentiles require a full sort per
    group — the scale path swaps in approx_percentile (t-digest sketch,
    single pass, mergeable) with the same call shape.
    """
    li = table(spark, sf_dir, "lineitem")
    scaled = scaled_long(F.col("l_quantity"), 100)
    return li.groupBy("l_returnflag").agg(
        (F.percentile(scaled, F.lit(0.25)) / 100.0).alias("q1"),
        (F.percentile(scaled, F.lit(0.50)) / 100.0).alias("med"),
        (F.percentile(scaled, F.lit(0.75)) / 100.0).alias("q3"),
    )


@query(
    "agg_stats_exact",
    oracle="""
WITH base AS (
  SELECT o_orderstatus,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS x100,
         CAST(FLOOR(o_totalprice + 0.5) AS BIGINT) AS x1
  FROM orders),
mu AS (
  SELECT o_orderstatus,
         CAST(SUM(x1) // COUNT(*) AS BIGINT) AS mu
  FROM base GROUP BY o_orderstatus),
agg AS (
  SELECT b.o_orderstatus,
         COUNT(*) AS n,
         CAST(SUM(x100) AS BIGINT) AS sx100,
         CAST(SUM(x1 - mu) AS BIGINT) AS sd,
         CAST(SUM((x1 - mu) * (x1 - mu)) AS BIGINT) AS sdd
  FROM base b JOIN mu USING (o_orderstatus)
  GROUP BY b.o_orderstatus)
SELECT o_orderstatus,
       n,
       round((CAST(sx100 AS DOUBLE) / 100.0) / n, 6) AS mean_price,
       round(sqrt((sdd - (sd * sd) / (1.0 * n)) / (n - 1)), 6) AS stddev_price
FROM agg
""",
)
def agg_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample standard deviation via exact-integer CENTERED moments.

    Built-in stddev/var use engine-specific streaming formulas (Welford vs
    sum-of-squares, different merge orders) that are not bit-reproducible
    across engines or partitionings. Here both engines compute: (pass 1) an
    integer floor-mean μ per group, (pass 2) exact integer Σd and Σd² of the
    deviations d = x−μ — order-insensitive by construction — then finish
    with a handful of identical float ops. Centering keeps the squares near
    the variance magnitude (raw Σx² of scaled prices overflows int64;
    deviations don't), which is also what makes the trick viable at 100 TB:
    the per-group state is three integers, merge-safe across any partial-
    aggregation tree, with DECIMAL(38,0) as the headroom escape if group
    counts push Σd² past 2^53.
    """
    o = table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        scaled_long(F.col("o_totalprice"), 100).alias("x100"),
        scaled_long(F.col("o_totalprice"), 1).alias("x1"),
    )
    mu = o.groupBy("o_orderstatus").agg(
        F.expr("sum(x1) div count(*)").alias("mu")
    )
    d = F.col("x1") - F.col("mu")
    agg = (
        o.join(F.broadcast(mu), "o_orderstatus")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x100").alias("sx100"),
            F.sum(d).alias("sd"),
            F.sum(d * d).alias("sdd"),
        )
    )
    n, sx100, sd, sdd = F.col("n"), F.col("sx100"), F.col("sd"), F.col("sdd")
    return agg.select(
        "o_orderstatus",
        "n",
        F.round((sx100.cast("double") / 100.0) / n, 6).alias("mean_price"),
        F.round(
            F.sqrt((sdd - (sd * sd) / (F.lit(1.0) * n)) / (n - 1)), 6
        ).alias("stddev_price"),
    )


@query(
    "key_skew_profile",
    oracle="""
WITH per_key AS (
  SELECT o_custkey AS k, COUNT(*) AS cnt
  FROM orders GROUP BY o_custkey),
hot AS (
  SELECT k, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, k ASC) AS rn
  FROM per_key)
SELECT COUNT(*) AS n_keys,
       CAST(SUM(cnt) AS BIGINT) AS n_rows,
       CAST(MAX(cnt) AS BIGINT) AS max_cnt,
       round(MAX(cnt) / ((CAST(SUM(cnt) AS DOUBLE)) / COUNT(*)), 6)
         AS skew_ratio,
       (SELECT string_agg(CAST(k AS VARCHAR), ',' ORDER BY rn)
        FROM hot WHERE rn <= 3) AS top3_keys
FROM per_key
""",
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic — the measurement you take BEFORE picking a
    strategy at 100 TB (broadcast? salt? AQE skew split?). One count
    aggregation per key, then a tiny global reduction: number of keys, rows,
    the hottest key's count, skew ratio (hottest / mean), and the top-3 hot
    keys. On real pipelines this runs on a sample; the shape is identical.
    """
    per_key = (
        table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("k"))
    top3 = (
        per_key.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("rn")
        .agg(F.concat_ws(",", F.collect_list(F.col("k").cast("string"))).alias("top3_keys"))
    )
    stats = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("cnt").alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
        F.round(
            F.max("cnt") / (F.sum("cnt").cast("double") / F.count(F.lit(1))), 6
        ).alias("skew_ratio"),
    )
    return stats.crossJoin(top3)


@query(
    "agg_approx_percentile",
    oracle="""
SELECT l_returnflag,
       quantile_disc(l_quantity, 0.25) AS q25,
       quantile_disc(l_quantity, 0.50) AS q50,
       quantile_disc(l_quantity, 0.75) AS q75,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile — the single-pass mergeable-sketch path that
    replaces agg_median_percentile's exact sort at 100 TB (same call shape,
    bounded memory, no per-group sort). Flattened to scalar q25/q50/q75
    columns (array columns break order-insensitive row canonicalization).
    At accuracy ≥ group size the GK sketch is rank-exact and lands on the
    same discrete element as DuckDB's quantile_disc (verified at sf0.01 and
    sf0.1); at 100 TB accuracy drops to sketch-grade and tests keep the
    exact op (agg_median_percentile) as truth."""
    li = table(spark, sf_dir, "lineitem")
    q = F.percentile_approx("l_quantity", [0.25, 0.5, 0.75], 1000000)
    return li.groupBy("l_returnflag").agg(
        q.getItem(0).alias("q25"),
        q.getItem(1).alias("q50"),
        q.getItem(2).alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "agg_regression_slope",
    oracle="""
WITH pts AS (
  SELECT o_custkey,
         CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS x,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS y
  FROM orders),
m AS (
  SELECT o_custkey,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM pts GROUP BY o_custkey)
SELECT o_custkey, n,
       round((n * sxy - sx * sy) / (1.0 * (n * sxx - sx * sx)) / 100.0, 6)
         AS slope_per_day
FROM m
WHERE n >= 2 AND n * sxx - sx * sx <> 0
""",
)
def agg_regression_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer spend trend: least-squares slope of order total over
    time — `regr_slope` semantics, but from exact integer moments (Σx, Σy,
    Σxy, Σx²) so both engines finish with identical float ops instead of
    each engine's own streaming covariance formula. Magnitudes: x ≤ ~2.4e3
    days, y ≤ ~5e7 scaled cents, xy ≤ ~1.2e11 per row — int64 holds ~7e7
    rows per group before DECIMAL headroom is needed. One shuffle,
    merge-safe partials, same shape at 100 TB.
    """
    o = table(spark, sf_dir, "orders")
    pts = o.select(
        "o_custkey",
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp"))
        .cast("long")
        .alias("x"),
        scaled_long(F.col("o_totalprice"), 100).alias("y"),
    )
    m = pts.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ["n", "sx", "sy", "sxy", "sxx"])
    det = n * sxx - sx * sx
    return (
        m.filter((n >= 2) & (det != 0))
        .select(
            "o_custkey",
            "n",
            F.round((n * sxy - sx * sy) / (F.lit(1.0) * det) / 100.0, 6).alias(
                "slope_per_day"
            ),
        )
    )


_HIST_WIDTH = 50000  # price-bucket width for the profile histogram


@query(
    "agg_histogram",
    oracle=f"""
SELECT CAST(FLOOR(o_totalprice / {_HIST_WIDTH}) AS BIGINT) AS bucket,
       CAST(FLOOR(o_totalprice / {_HIST_WIDTH}) AS BIGINT) * {_HIST_WIDTH}.0
         AS bucket_lo,
       COUNT(*) AS n
FROM orders
GROUP BY bucket
""",
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram — the profiling primitive behind data-quality
    dashboards and skew diagnosis. Bucket id is integer floor-division
    (identical in both engines); one map-side-combined shuffle over at most
    range/width groups, so cost is independent of row count beyond the scan.
    """
    o = table(spark, sf_dir, "orders")
    bucket = F.floor(F.col("o_totalprice") / _HIST_WIDTH).cast("long")
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * float(_HIST_WIDTH)).alias("bucket_lo"),
            "n",
        )
    )


@query(
    "agg_argmax",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) * 10000000
           + o_orderkey AS ord
  FROM orders)
SELECT o_custkey,
       arg_max(o_orderkey, ord) AS top_order,
       arg_min(o_orderkey, ord) AS bottom_order,
       COUNT(*) AS n_orders
FROM o
GROUP BY o_custkey
""",
)
def agg_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argmax/argmin aggregates (`max_by`/`min_by`): which order was each
    customer's most/least expensive — the lookup-without-self-join shape
    that replaces a groupBy+join-back at scale (one shuffle instead of two).

    Determinism: max_by is tie-UNSTABLE by contract, so the ordinal is a
    composite exact integer (scaled price ‖ orderkey) that is unique per
    group — both engines then have exactly one argmax. The 10^7 key stride
    bounds orderkey; production uses a wider stride or a struct ordinal.
    """
    o = table(spark, sf_dir, "orders")
    ord_ = scaled_long(F.col("o_totalprice"), 100) * F.lit(10000000) + F.col("o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", ord_.alias("ord"))
        .groupBy("o_custkey")
        .agg(
            F.max_by("o_orderkey", F.col("ord")).alias("top_order"),
            F.min_by("o_orderkey", F.col("ord")).alias("bottom_order"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@query(
    "rollup_incremental_merge",
    oracle="""
WITH c AS (
  SELECT event_type, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events)
SELECT event_type,
       COUNT(*) + COUNT(CASE WHEN event_id % 101 = 0 THEN 1 END) AS n_events,
       (SUM(cents) + SUM(CASE WHEN event_id % 101 = 0 THEN cents ELSE 0 END))
         / 100.0 AS sum_value
FROM c
GROUP BY event_type
""",
)
def rollup_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-rollup maintenance (the hypertable/continuous-aggregate
    pattern): a stored daily pre-aggregate table absorbs a late-arriving
    delta batch by AGGREGATING AGGREGATES — counts add, exact integer sums
    add — then answers the per-type query from the merged rollup, never
    rescanning the raw events. This mergeability is why the rollup exists:
    at 100 TB the raw log is append-only and petabyte-sized, while the
    daily table is millions of rows; late data re-aggregates one day, not
    the world. The delta here is the event_id % 101 slice replayed as if
    it arrived late, so the oracle counts those rows twice."""
    import os
    import tempfile

    e = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.date_trunc("day", F.col("ts")).alias("day"),
        scaled_long(F.col("value"), 100).alias("cents"),
    )
    daily = e.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("cents"),
    )
    token = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    store = os.path.join(tempfile.gettempdir(), f"t20_rollup_{token}")
    daily.write.mode("overwrite").parquet(store)  # the stored rollup table

    delta = (
        e.filter(F.col("event_id") % 101 == 0)
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("cents"))
    )
    merged = (
        spark.read.parquet(store)
        .unionByName(delta)
        .groupBy("event_type", "day")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
    )
    return merged.groupBy("event_type").agg(
        F.sum("n").alias("n_events"),
        (F.sum("cents") / F.lit(100.0)).alias("sum_value"),
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
WITH words AS (
  SELECT event_type, user_id // 32 AS word, bit_or(1::BIGINT << (user_id % 32)) AS bits
  FROM events
  GROUP BY event_type, user_id // 32)
SELECT event_type,
       CAST(SUM(bit_count(bits)) AS BIGINT) AS n_users,
       COUNT(*) AS n_words
FROM words
GROUP BY event_type
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting via positional bitmaps (the roaring-bitmap
    technique): pack user ids into 64-bit words with bit_or, then sum
    popcounts — two cheap integer aggregations instead of the
    expand-and-dedup a COUNT(DISTINCT) pays. Unlike HLL
    (agg_approx_distinct) the answer is exact, and the intermediate bitmap
    words are mergeable state: at 100 TB they persist per partition/day
    and re-aggregate like the rollup_incremental_merge dailies. Best when
    the id domain is dense and bounded (users, items); HLL wins on sparse
    unbounded domains (urls, ngrams)."""
    e = table(spark, sf_dir, "events").select("event_type", "user_id")
    words = e.groupBy(
        "event_type", F.expr("user_id div 32").alias("word")
    ).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))")
        ).alias("bits")
    )
    return words.groupBy("event_type").agg(
        F.sum(F.bit_count("bits")).alias("n_users"),
        F.count(F.lit(1)).alias("n_words"),
    )


@query(
    "agg_sketch_union",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events,
       TRUE AS hll_within_tol,
       TRUE AS theta_within_tol
FROM events
GROUP BY event_type
""",
)
def agg_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch workflow (Apache DataSketches, Spark 3.5+): build
    per-(type, day) HLL and Theta sketches — the shape a 100 TB pipeline
    persists per partition — then union across days and estimate, the way
    a dashboard rolls up any date range without rescanning events. Both
    sketch families are hash-based and RNG-free, so estimates are
    deterministic; the driver-facing columns are the exact counts plus
    guarantee booleans (estimate within 15% — a broken sketch/union path
    is off by orders of magnitude and turns the row red), because raw
    sketch bytes are engine-specific. The band is ~9× the sketches'
    configured error (HLL lgK=12 → RSE ≈ 1.6%), so a regenerated fixture
    with an unlucky cardinality cannot flip the boolean while a real
    union/estimate defect still does.
    Union state is tiny and associative: re-aggregating N daily sketches
    moves N×|sketch| bytes, never the event log."""
    e = table(spark, sf_dir, "events").select("event_type", "user_id", "ts")
    daily = e.groupBy("event_type", F.to_date("ts").alias("d")).agg(
        F.hll_sketch_agg("user_id").alias("hll"),
        F.theta_sketch_agg("user_id").alias("theta"),
        F.countDistinct("user_id").alias("nd"),
        F.count(F.lit(1)).alias("ne"),
    )
    merged = daily.groupBy("event_type").agg(
        F.expr("hll_sketch_estimate(hll_union_agg(hll))").alias("hll_est"),
        F.expr("theta_sketch_estimate(theta_union_agg(theta))").alias("theta_est"),
        F.sum("ne").alias("n_events"),
    )
    exact = e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_users"))
    ok = lambda est: (  # noqa: E731
        F.abs(F.col(est) - F.col("n_users")) <= F.lit(0.15) * F.col("n_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_users",
        "n_events",
        ok("hll_est").alias("hll_within_tol"),
        ok("theta_est").alias("theta_within_tol"),
    )


@query(
    "agg_equidepth_histogram",
    oracle="""
WITH b AS (
  SELECT o_totalprice,
         NTILE(10) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
  FROM orders)
SELECT bucket, COUNT(*) AS n_rows,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM b GROUP BY bucket
""",
)
def agg_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equi-height) histogram: 10 buckets holding equal row
    counts with their value bounds — the statistics shape cost-based
    optimizers and skew diagnostics actually want (equi-WIDTH buckets,
    agg_histogram, collapse under heavy tails; equi-depth adapts bucket
    width to density). NTILE over a composite order (value, key) makes
    bucket assignment deterministic under duplicate values in both
    engines.

    Scale note: a full-data NTILE is a global sort; at 100 TB the same
    histogram is built from approx_percentile bucket bounds on a sample
    (one pass, mergeable), with this exact formulation as the
    verification path — the same exact/approximate split as the dedup
    family."""
    o = table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    b = o.select("o_totalprice", F.ntile(10).over(w).alias("bucket"))
    return b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@query(
    "agg_grouping_id",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT)
         AS gid,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                        (o_orderstatus), ())
""",
)
def agg_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with the grouping-ID bitmask — the column that lets a
    single multi-level result feed different consumers (detail rows vs
    subtotal rows vs grand total) without re-aggregating: each row carries
    which dimensions are aggregated away. Spark's grouping_id() and the
    oracle's per-column GROUPING() bits compose to the same integer. One
    expand + one partial-aggregable shuffle, same as the plain sets
    query."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select("o_orderstatus", "o_orderpriority", "gid", "n_orders")
    )


@query(
    "agg_count_min_sketch",
    oracle="""
WITH rr AS (SELECT unnest([0, 1, 2, 3]) AS r),
cells AS (
  SELECT rr.r,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1 + 8 * rr.r, 8))
              AS BIGINT) % 256 AS col
  FROM events CROSS JOIN rr),
sketch AS (SELECT r, col, COUNT(*) AS c FROM cells GROUP BY r, col),
truth AS (SELECT user_id, md5(CAST(user_id AS VARCHAR)) AS m, COUNT(*) AS n_true
          FROM events GROUP BY user_id),
est AS (
  SELECT t.user_id, t.n_true, MIN(s.c) AS n_est
  FROM truth t CROSS JOIN rr
  JOIN sketch s
    ON s.r = rr.r
   AND s.col = CAST(('0x' || substr(t.m, 1 + 8 * rr.r, 8)) AS BIGINT) % 256
  GROUP BY t.user_id, t.n_true)
SELECT user_id, n_true, CAST(n_est AS BIGINT) AS n_est,
       CAST(n_est - n_true AS BIGINT) AS overcount
FROM est
ORDER BY n_true DESC, user_id ASC
LIMIT 20
""",
)
def agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode-Muthukrishnan) with d=4 rows x w=256
    counters, hashed by four DISJOINT 32-bit slices of one md5 — the
    portable-hash construction (operators/llm.hash60 family) so the
    sketch is bit-identical in the oracle, which rebuilds it from the
    same slices. Per event the key charges one counter per row; a key's
    estimate is the MIN over its d counters — always >= the true count,
    with the overcount column showing the collision inflation that the
    min suppresses.

    The 100 TB story is the whole point: the sketch is a FIXED 4x256
    cell table regardless of key cardinality, built by one map-side-
    combinable groupBy over an explode-by-4 (no per-key state), and it
    merges across partitions/days by cell-wise addition — the streaming
    /distributed frequency sketch a heavy-hitter pipeline actually
    ships. The exact `truth` side here exists only to exhibit the
    estimate-vs-true contract on the top-20 keys (TakeOrderedAndProject,
    never a global sort)."""
    ev = table(spark, sf_dir, "events").select(
        "user_id", F.md5(F.col("user_id").cast("string")).alias("m")
    )
    slices = [
        F.struct(
            F.lit(r).alias("r"),
            (F.conv(F.substring("m", 1 + 8 * r, 8), 16, 10).cast("long") % 256).alias(
                "col"
            ),
        )
        for r in range(4)
    ]
    cells = ev.select(F.explode(F.array(*slices)).alias("rc")).select(
        F.col("rc.r").alias("r"), F.col("rc.col").alias("col")
    )
    sketch = cells.groupBy("r", "col").agg(F.count(F.lit(1)).alias("c"))
    truth = ev.groupBy("user_id", "m").agg(F.count(F.lit(1)).alias("n_true"))
    probe = truth.select(
        "user_id", "n_true", F.explode(F.array(*slices)).alias("rc")
    ).select("user_id", "n_true", F.col("rc.r").alias("r"), F.col("rc.col").alias("col"))
    est = (
        probe.join(F.broadcast(sketch), ["r", "col"])
        .groupBy("user_id", "n_true")
        .agg(F.min("c").alias("n_est"))
    )
    return (
        est.select(
            "user_id",
            "n_true",
            "n_est",
            (F.col("n_est") - F.col("n_true")).alias("overcount"),
        )
        .orderBy(F.col("n_true").desc(), F.col("user_id").asc())
        .limit(20)
    )


@query(
    "agg_kmv_intersection",
    oracle="""
WITH pts AS (
  SELECT DISTINCT user_id,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15)) AS BIGINT)
           AS h,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY user_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY h ASC, user_id ASC) AS rk
  FROM pts),
sk AS (SELECT * FROM ranked WHERE rk <= 64),
tau AS (SELECT MAX(h) AS tau, COUNT(*) AS k_eff FROM sk),
exact AS (SELECT COUNT(*) AS n_exact FROM pts WHERE in_a = 1 AND in_b = 1)
SELECT 64 AS k, tau.k_eff, tau.tau,
       CAST((SELECT COUNT(*) FROM sk WHERE in_a = 1 AND in_b = 1) AS BIGINT)
         AS n_common,
       exact.n_exact,
       CASE WHEN tau.k_eff < 64
            THEN CAST((SELECT COUNT(*) FROM pts) AS DOUBLE)
            ELSE (64 - 1) * CAST(1152921504606846976 AS DOUBLE) / tau.tau
       END AS est_union,
       CASE WHEN tau.k_eff < 64
            THEN CAST(exact.n_exact AS DOUBLE)
            ELSE ((SELECT COUNT(*) FROM sk WHERE in_a = 1 AND in_b = 1)
                  / CAST(64 AS DOUBLE))
                 * ((64 - 1) * CAST(1152921504606846976 AS DOUBLE) / tau.tau)
       END AS est_intersection
FROM tau CROSS JOIN exact
""",
)
def agg_kmv_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k minimum values, Beyer et al.) distinct-and-intersection
    sketch over the click/purchase user sets: keep the k=64 smallest
    portable 60-bit hashes of the UNION; the k-th value tau estimates
    union cardinality as (k-1)*2^60/tau, and the fraction of sketch
    members belonging to both sets estimates Jaccard, hence the
    intersection. One row out: estimate next to exact truth.

    100 TB shape: the sketch is a bounded top-k by hash — per-partition
    heaps then a 64-row merge, no global sort, no per-key state — and
    KMV sketches merge by union-then-truncate, so per-day sketches roll
    up exactly like the count-min cells (agg_count_min_sketch). When the
    union has fewer than k distinct members the sketch IS the set and
    both estimates collapse to the exact values (same CASE on both
    engines — exercised at sf0.001 where only ~15 users exist).
    Determinism: hash ties broken by user_id; all arithmetic either
    integer or a single identical float expression."""
    ev = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.max(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("in_a"),
            F.max(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("in_b"),
        )
        .withColumn(
            "h",
            F.conv(
                F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10
            ).cast("long"),
        )
    )
    w = Window.orderBy(F.col("h").asc(), F.col("user_id").asc())
    sk = ev.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 64)
    two60 = F.lit(1152921504606846976).cast("double")
    agg = sk.agg(
        F.max("h").alias("tau"),
        F.count(F.lit(1)).alias("k_eff"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("n_common"),
    )
    totals = ev.agg(
        F.count(F.lit(1)).alias("n_union"),
        F.sum(
            F.when((F.col("in_a") == 1) & (F.col("in_b") == 1), 1).otherwise(0)
        ).alias("n_exact"),
    )
    full = F.col("k_eff") >= 64
    est_union = F.when(
        ~full, F.col("n_union").cast("double")
    ).otherwise(F.lit(64 - 1) * two60 / F.col("tau"))
    est_inter = F.when(~full, F.col("n_exact").cast("double")).otherwise(
        (F.col("n_common") / F.lit(64).cast("double"))
        * (F.lit(64 - 1) * two60 / F.col("tau"))
    )
    return (
        agg.crossJoin(F.broadcast(totals))
        .select(
            F.lit(64).cast("int").alias("k"),
            "k_eff",
            "tau",
            F.col("n_common").cast("long").alias("n_common"),
            F.col("n_exact").alias("n_exact"),
            est_union.alias("est_union"),
            est_inter.alias("est_intersection"),
        )
    )
