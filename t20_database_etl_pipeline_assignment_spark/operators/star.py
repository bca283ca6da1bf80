"""Flagship query: revenue by region and order-year over the 5-way star join.

Reference parity: the reference's core declared workload is dimensional
ETL + analysis over a star schema (reference README.md:2 "process and manage
... match data", README.md:6 dimensions, README.md:10 "querying and
analysis"). This is the canonical star-navigation query shape:
lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region, filter, group, aggregate.

Spark-first physical design (verified via .explain("formatted")):
- The date filter on l_shipdate and the column projection push down into the
  Parquet scan (PushedFilters / ReadSchema) — at 100 TB this skips row groups
  server-side instead of filtering 100 TB in memory.
- nation/region/customer/supplier are small dims: Spark broadcasts them
  (autoBroadcastJoinThreshold + AQE), so the only shuffle is lineitem⋈orders;
  we give the optimizer an explicit `broadcast()` hint for nation/region so
  the plan is stable even without fresh stats.
- The aggregation is a partial (map-side) hash agg then a final agg on the
  (r_name, year) keys — low-cardinality, no skew concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import money_sum, scaled_long, sql_money_sum
from ..registry import query
from ..sources.tables import table

_SHIP_LO = "1996-01-01"
_SHIP_HI = "1999-01-01"

ORACLE_STAR = f"""
SELECT
  r_name,
  CAST(year(o_orderdate) AS BIGINT) AS order_year,
  {sql_money_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue,
  COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE l_shipdate >= TIMESTAMP '{_SHIP_LO}'
  AND l_shipdate <  TIMESTAMP '{_SHIP_HI}'
GROUP BY r_name, order_year
"""


@query("join_multiway_star", oracle=ORACLE_STAR)
def join_multiway_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit(_SHIP_LO).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(_SHIP_HI).cast("timestamp"))
    )
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    region = table(spark, sf_dir, "region")

    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(
            F.col("r_name"),
            F.year("o_orderdate").cast("long").alias("order_year"),
        )
        .agg(
            money_sum(revenue, 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query("sql_flagship_star", oracle=ORACLE_STAR)
def sql_flagship_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same flagship query through the `spark.sql` TEXT entry point —
    proving the engine's second API surface (SURVEY.md §3.2 EP1 vs EP2):
    SQL text and the DataFrame DSL converge on the identical Catalyst plan,
    so both are first-class ways to drive every operator here. The scaled-
    integer SUM is spelled inline; the broadcast hint rides the SQL hint
    syntax."""
    for t in ("lineitem", "orders", "customer", "nation", "region"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        f"""
        SELECT /*+ BROADCAST(v_nation), BROADCAST(v_region) */
          r_name,
          CAST(year(o_orderdate) AS BIGINT) AS order_year,
          SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * CAST(10000 AS DOUBLE)
                         + CAST(0.5 AS DOUBLE)) AS BIGINT))
            / CAST(10000 AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM v_lineitem
        JOIN v_orders   ON l_orderkey = o_orderkey
        JOIN v_customer ON o_custkey = c_custkey
        JOIN v_nation   ON c_nationkey = n_nationkey
        JOIN v_region   ON n_regionkey = r_regionkey
        WHERE l_shipdate >= TIMESTAMP '{_SHIP_LO}'
          AND l_shipdate <  TIMESTAMP '{_SHIP_HI}'
        GROUP BY r_name, order_year
        """
    )


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    """Entry-point wrapper used by the driver smoke check."""
    return join_multiway_star(spark, sf_dir)


@query(
    "sql_unshipped_revenue_topk",
    oracle="""
SELECT o_orderkey, o_orderdate,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * CAST(10000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT))
         / CAST(10000 AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate ASC, o_orderkey ASC
LIMIT 10
""",
)
def sql_unshipped_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped composite ("shipping priority"): highest-revenue
    orders taken before a date whose goods shipped after it — a selective
    dim filter, a fact⋈fact join, an aggregate, and a global top-k, all in
    one SQL text. The plan this must produce at 100 TB: c_mktsegment and
    the date predicates pushed into all three scans, customer broadcast,
    revenue partial-aggregated before the shuffle, and the final top-10 via
    TakeOrderedAndProject (per-partition heaps), never a global sort.
    Ordering carries (revenue, o_orderdate, o_orderkey) so ties are
    deterministic cross-engine."""
    for t in ("lineitem", "orders", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(v_customer) */
          o_orderkey, o_orderdate,
          SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * CAST(10000 AS DOUBLE)
                         + CAST(0.5 AS DOUBLE)) AS BIGINT))
            / CAST(10000 AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM v_lineitem
        JOIN v_orders   ON l_orderkey = o_orderkey
        JOIN v_customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01'
          AND l_shipdate  > TIMESTAMP '1998-01-01'
        GROUP BY o_orderkey, o_orderdate
        ORDER BY revenue DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 10
        """
    )


@query(
    "sql_exists_subquery",
    oracle="""
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 1000)
""",
)
def sql_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subqueries — the SQL surface Catalyst
    rewrites into left-semi and left-anti joins (never a per-row probe):
    customers holding at least one 400k+ order and no sub-1k order. The
    physical plan is two hash joins over one orders scan pair — exactly
    what a hand-written semi/anti DSL chain produces, proving subquery
    users get the scale plan for free."""
    for t in ("customer", "orders"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment
        FROM v_customer c
        WHERE EXISTS (SELECT 1 FROM v_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
          AND NOT EXISTS (SELECT 1 FROM v_orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_totalprice < 1000)
        """
    )


@query(
    "sql_recursive_hierarchy",
    oracle="""
WITH RECURSIVE emp AS (
  SELECT c_custkey AS id, c_custkey // 4 AS parent
  FROM customer WHERE c_custkey BETWEEN 1 AND 100),
walk(id, depth, root) AS (
  SELECT id, 0 AS depth, id AS root FROM emp WHERE parent = 0
  UNION ALL
  SELECT e.id, w.depth + 1, w.root
  FROM emp e JOIN walk w ON e.parent = w.id
)
SELECT id, depth, root FROM walk
""",
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 WITH RECURSIVE): walk a synthetic org
    hierarchy (id → parent = id div 4) from the roots down, labeling every
    node with its depth and root — the org-chart / BOM traversal shape.
    Each recursion step is one co-partitioned join; Spark executes the
    fixpoint as iterated plans exactly like the hand-built label
    propagation in cluster_connected_components, but expressed in pure
    SQL. DuckDB runs the identical text."""
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH RECURSIVE emp AS (
          SELECT c_custkey AS id, c_custkey div 4 AS parent
          FROM v_customer WHERE c_custkey BETWEEN 1 AND 100),
        walk(id, depth, root) AS (
          SELECT id, 0 AS depth, id AS root FROM emp WHERE parent = 0
          UNION ALL
          SELECT e.id, w.depth + 1, w.root
          FROM emp e JOIN walk w ON e.parent = w.id
        )
        SELECT id, depth, root FROM walk
        """
    )


@query(
    "sql_lateral_topn",
    oracle="""
SELECT n.n_name, l.c_custkey, l.acctbal_c
FROM nation n,
LATERAL (
  SELECT c_custkey,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
  FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY acctbal_c DESC, c_custkey ASC
  LIMIT 2
) l
""",
)
def sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery — per-nation top-2 customers by balance,
    written as "for each dim row, run this parameterized query". Catalyst
    decorrelates the lateral into a join + per-key limit instead of
    re-executing the inner query per row; ordering on (exact cents,
    custkey) keeps both engines' top-2 identical under ties."""
    for t in ("nation", "customer"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT n.n_name, l.c_custkey, l.acctbal_c
        FROM v_nation n,
        LATERAL (
          SELECT c_custkey,
                 CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
          FROM v_customer c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY acctbal_c DESC, c_custkey ASC
          LIMIT 2
        ) l
        """
    )


@query(
    "sql_correlated_scalar_subquery",
    oracle="""
WITH o AS (
  SELECT o_custkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders)
SELECT c.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_above
FROM o c
WHERE c.cents * (SELECT COUNT(*) FROM o i WHERE i.o_custkey = c.o_custkey)
      > (SELECT SUM(cents) FROM o i WHERE i.o_custkey = c.o_custkey)
GROUP BY c.o_custkey
""",
)
def sql_correlated_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated SCALAR subqueries — the remaining subquery shape after
    EXISTS (sql_exists_subquery): each order compared to its own
    customer's average price, written as two correlated aggregates that
    Catalyst decorrelates into grouped joins (never a per-row re-scan).
    The average test is integer cross-multiplication (cents·n > Σcents),
    so the answer is bit-exact in both engines with no float division.
    Identical SQL text runs on DuckDB as the oracle — proving the text
    surface, not just the DSL, gets the decorrelated scale plan."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    return spark.sql(
        """
        WITH o AS (
          SELECT o_custkey,
                 CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
          FROM v_orders)
        SELECT c.o_custkey, CAST(COUNT(*) AS BIGINT) AS n_above
        FROM o c
        WHERE c.cents * (SELECT COUNT(*) FROM o i WHERE i.o_custkey = c.o_custkey)
              > (SELECT SUM(cents) FROM o i WHERE i.o_custkey = c.o_custkey)
        GROUP BY c.o_custkey
        """
    )


@query(
    "sql_late_shipment_priority",
    oracle="""
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o_orderpriority
""",
)
def sql_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape adapted to this schema: per order priority, how many
    quarter-Q1-1996 orders had at least one line item shipped more than 90
    days after the order date — the order-fulfillment SLA report. The
    correlated EXISTS (with a non-equi residual on the two tables' date
    columns riding the equi orderkey join) decorrelates to a left-semi
    hash join; the date window pushes into the orders scan. Exact integer
    counts and pure date arithmetic — bit-identical in both engines."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 90 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders")
    )


@query(
    "sql_top_supplier_revenue",
    oracle="""
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * CAST(10000 AS DOUBLE)
                        + 0.5) AS BIGINT)) AS rev_scaled
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey),
mx AS (SELECT MAX(rev_scaled) AS mx FROM rev)
SELECT s.s_suppkey, s.s_name,
       r.rev_scaled / CAST(10000 AS DOUBLE) AS total_revenue
FROM rev r
JOIN mx ON r.rev_scaled = mx.mx
JOIN supplier s ON s.s_suppkey = r.l_suppkey
""",
)
def sql_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, returning the
    top supplier(s) — ties included, exactly as the spec's view+max
    formulation requires (a top-1 LIMIT would silently drop ties). The
    global max arrives as a 1-row aggregate joined back on EQUALITY of
    the exact scaled-integer revenue (a broadcast hash join on the value,
    not a nested loop, and no global sort); the supplier dimension
    broadcasts. Revenue is the same exact integer-cents formulation as
    the flagship star query, so the float division at the end is the
    only float op and is identical in both engines."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp_ntz"))
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    rev = li.groupBy("l_suppkey").agg(
        F.sum(scaled_long(revenue, 10000)).alias("rev_scaled")
    )
    mx = rev.agg(F.max("rev_scaled").alias("mx"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev["rev_scaled"] == mx["mx"])
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            (F.col("rev_scaled") / F.lit(10000.0)).alias("total_revenue"),
        )
    )


@query(
    "sql_local_supplier_share",
    oracle="""
WITH flows AS (
  SELECT cn.n_name AS nation,
         CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * CAST(10000 AS DOUBLE)
                    + 0.5) AS BIGINT) AS rev_scaled,
         CASE WHEN c.c_nationkey = s.s_nationkey THEN 1 ELSE 0 END AS is_local
  FROM lineitem l
  JOIN orders o   ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation cn  ON c.c_nationkey = cn.n_nationkey)
SELECT nation,
       SUM(CASE WHEN is_local = 1 THEN rev_scaled ELSE 0 END)
         / CAST(10000 AS DOUBLE) AS local_revenue,
       SUM(rev_scaled) / CAST(10000 AS DOUBLE) AS total_revenue,
       SUM(CASE WHEN is_local = 1 THEN rev_scaled ELSE 0 END)
         / (1.0 * SUM(rev_scaled)) AS local_share
FROM flows
GROUP BY nation
""",
)
def sql_local_supplier_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5/Q7 flavor: per customer nation, how much revenue is served
    by suppliers of the SAME nation vs any supplier — the local-sourcing
    share a trade report leads with. The fact table streams once through
    four broadcast dimension joins (orders is the largest side but the
    probe order keeps lineitem streaming); the local flag is computed in
    the join projection so the aggregate is one partial-aggregable
    groupBy on the 25-nation key. Revenue is exact scaled cents; the two
    final divisions are the only float ops and share operand text with
    the oracle."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    flows = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            scaled_long(revenue, 10000).alias("rev_scaled"),
            F.when(F.col("c_nationkey") == F.col("s_nationkey"), 1)
            .otherwise(0)
            .alias("is_local"),
        )
    )
    local = F.sum(F.when(F.col("is_local") == 1, F.col("rev_scaled")).otherwise(0))
    total = F.sum("rev_scaled")
    return flows.groupBy("nation").agg(
        (local / F.lit(10000).cast("double")).alias("local_revenue"),
        (total / F.lit(10000).cast("double")).alias("total_revenue"),
        (local / (F.lit(1.0) * total)).alias("local_share"),
    )


@query(
    "sql_sole_blame_supplier",
    oracle="""
SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem
      WHERE l_returnflag = 'R') l1
  ON l1.l_suppkey = s.s_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s.s_suppkey, s.s_name
""",
)
def sql_sole_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (adapted: this fixture has no l_receiptdate, so
    "kept waiting" becomes "returned", the analogous fault flag): per
    supplier, the number of multi-supplier orders where THIS supplier is
    the only one whose lines were returned — the sole-blame count.

    The oracle states it as the spec does: a correlated EXISTS plus a
    correlated NOT EXISTS against the same fact table. The Spark plan
    deliberately does NOT translate those as two extra joins: one pass
    over lineitem computes per-order supplier counts and returned-
    supplier counts (partial-aggregable, one shuffle on l_orderkey),
    and the EXISTS/NOT EXISTS pair collapses to `n_supp >= 2 AND
    n_ret_supp = 1` — the decorrelated formulation a 100 TB plan wants
    (Q21 via three lineitem scans is the classic benchmark trap). The
    supplier dimension broadcasts onto the blamed rows at the end.

    One shuffle of the fact, one scan (r10): lineitem reduces FIRST to
    distinct (l_orderkey, l_suppkey, had-a-returned-line) groups — the
    grain both downstream counts need — so the per-order supplier counts
    are plain partial-aggregable count/sum over that relation (no Expand
    from the two countDistincts) and the blamed-pair relation is the SAME
    aggregate filtered (Catalyst reuses the exchange: one lineitem scan +
    one wide shuffle feeds both branches; countDistinct over the raw rows
    would Expand 600 k rows 2× and the old separate `distinct` pass paid
    a second scan + shuffle)."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    order_supp = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("ret")
    )
    per_order = order_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("ret").alias("n_ret_supp"),
    )
    blamed = order_supp.filter(F.col("ret") == 1).select(
        "l_orderkey", "l_suppkey"
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(
            per_order.filter(
                (F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_suppkey", "s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@query(
    "sql_dormant_high_value",
    oracle="""
WITH thr AS (
  SELECT SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS bal_cents,
         COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0),
dormant AS (
  SELECT c.c_mktsegment, CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer c CROSS JOIN thr
  WHERE CAST(FLOOR(c.c_acctbal * 100 + 0.5) AS BIGINT) * thr.n > thr.bal_cents
    AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01'))
SELECT c_mktsegment, COUNT(*) AS n_cust,
       SUM(cents) / CAST(100 AS DOUBLE) AS total_acctbal
FROM dormant GROUP BY c_mktsegment
""",
)
def sql_dormant_high_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: no c_phone in this fixture, so the
    country-code grouping becomes c_mktsegment): customers whose balance
    beats the average positive balance yet who have never ordered —
    dormant capital, grouped by market segment.

    The above-average test is exact integer cross-multiplication
    (cents * n > sum_cents) so no division ever happens on the filter
    path and both engines agree bit-for-bit; the scalar aggregate is a
    1-row broadcast; the NOT EXISTS is a left_anti join against the
    orders key projection — at 100 TB that anti-join shuffles only the
    two key columns, and the segment rollup is partial-aggregable on a
    handful of keys."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", scaled_long(F.col("c_acctbal"), 100).alias("cents")
    )
    thr = (
        c.filter(F.col("cents") > 0)
        .agg(F.sum("cents").alias("bal_cents"), F.count(F.lit(1)).alias("n"))
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp_ntz"))
        .select("o_custkey")
    )
    dormant = (
        c.crossJoin(F.broadcast(thr))
        .filter(F.col("cents") * F.col("n") > F.col("bal_cents"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
    )
    return dormant.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cust"),
        (F.sum("cents") / F.lit(100).cast("double")).alias("total_acctbal"),
    )


@query(
    "sql_dominant_part_supplier",
    oracle="""
SELECT s.s_name, p.p_name, q.supp_qty_c / CAST(100 AS DOUBLE) AS supp_qty,
       q.part_qty_c / CAST(100 AS DOUBLE) AS part_qty
FROM (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS supp_qty_c,
         SUM(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)))
           OVER (PARTITION BY l_partkey) AS part_qty_c
  FROM lineitem WHERE l_shipdate >= TIMESTAMP '2001-01-01'
  GROUP BY l_partkey, l_suppkey) q
JOIN part p ON p.p_partkey = q.l_partkey
JOIN supplier s ON s.s_suppkey = q.l_suppkey
WHERE q.supp_qty_c * 2 > q.part_qty_c
  AND q.l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
""",
)
def sql_dominant_part_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: no partsupp table, so "availability
    above half the shipped quantity" becomes "this supplier shipped more
    than half of the part's total volume"): for large parts (p_size >=
    40, the p_name-LIKE analogue on this fixture's schema), find the
    supplier that dominates each part's recent supply (shipments since
    2001 — the recency window that makes dominance a live signal rather
    than a whole-history average).

    One groupBy on (l_partkey, l_suppkey) plus a window re-aggregate
    over l_partkey reuses the SAME shuffle (partkey prefix), so the
    per-part total costs no second exchange; the dominance test is
    integer (2*supp > part in exact centi-units, no division); the part
    filter semi-joins as a broadcast before the dimension joins.
    The oracle keeps the spec's nested-IN flavor."""
    p_big = table(spark, sf_dir, "part").filter(F.col("p_size") >= 40)
    li = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") >= F.lit("2001-01-01").cast("timestamp_ntz"))
        .select(
            "l_partkey",
            "l_suppkey",
            scaled_long(F.col("l_quantity"), 100).alias("qty_c"),
        )
    )
    per_pair = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("qty_c").alias("supp_qty_c")
    )
    w = Window.partitionBy("l_partkey")
    dominant = per_pair.withColumn(
        "part_qty_c", F.sum("supp_qty_c").over(w)
    ).filter(F.col("supp_qty_c") * 2 > F.col("part_qty_c"))
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        dominant.join(
            F.broadcast(p_big.select("p_partkey", "p_name")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_name",
            "p_name",
            (F.col("supp_qty_c") / F.lit(100).cast("double")).alias("supp_qty"),
            (F.col("part_qty_c") / F.lit(100).cast("double")).alias("part_qty"),
        )
    )


@query(
    "sql_order_count_distribution",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderstatus <> 'F'
  GROUP BY c_custkey)
SELECT n_orders, COUNT(*) AS custdist
FROM c_orders GROUP BY n_orders
""",
)
def sql_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape ("customer distribution"): how many customers
    placed exactly N qualifying orders — INCLUDING the zero-order
    customers, which is why the join must be LEFT OUTER with the status
    predicate inside the join condition (a WHERE would silently turn it
    inner and drop the n_orders=0 bucket, the classic Q13 trap).

    Scale shape: the outer join shuffles both sides on custkey, and the
    first groupBy is on the SAME key, so it rides the join's exchange
    without a second shuffle (EnsureRequirements reuses the
    partitioning). The second groupBy folds ~50 distinct counts — a
    few-row final exchange. COUNT(o_orderkey) counts non-null matches
    only, identical to DuckDB. Reference parity: README.md:10-13
    "querying and analysis" over the order-management star."""
    c = table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "F")
        .select("o_custkey", "o_orderkey")
    )
    per = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per.groupBy("n_orders").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "sql_large_volume_customer",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS qty_c
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) > 25000)
SELECT c_custkey, c_name, o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       qty_c / CAST(100 AS DOUBLE) AS total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""",
)
def sql_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape ("large volume customer"): orders whose total
    line quantity exceeds 250 units (top ~4% of orders on this fixture),
    with the customer who placed them.

    Scale shape: ONE aggregation over lineitem keyed on l_orderkey, and
    the HAVING prunes it to a sliver BEFORE any join — so the survivor
    set is explicitly broadcast into the orders scan (no lineitem ×
    orders shuffle join), and the still-tiny result broadcasts again
    into customer. At 100 TB the big-order list is hundreds of rows;
    both joins stay build-side-KB broadcast hash joins. Quantities are
    exact centi-integers end to end, divided once for display."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", scaled_long(F.col("l_quantity"), 100).alias("qty_c")
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("qty_c").alias("qty_c"))
        .filter(F.col("qty_c") > 25000)
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    hit = o.join(F.broadcast(big), F.col("l_orderkey") == F.col("o_orderkey"))
    return (
        c.join(F.broadcast(hit), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.year("o_orderdate").cast("long").alias("order_year"),
            (F.col("qty_c") / F.lit(100).cast("double")).alias("total_qty"),
        )
    )


@query(
    "sql_value_share_threshold",
    oracle="""
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5)
                  AS BIGINT)) AS val_s
  FROM lineitem GROUP BY l_partkey),
tot AS (SELECT SUM(val_s) AS tot_s, COUNT(*) AS n_parts FROM pv)
SELECT l_partkey, val_s / CAST(10000 AS DOUBLE) AS part_value
FROM pv, tot WHERE CAST(val_s AS HUGEINT) * 2 * n_parts > 3 * tot_s
""",
)
def sql_value_share_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape ("important stock identification", adapted: no
    partsupp table, so a part's "value" is its discounted lifetime
    revenue): parts whose value exceeds 1.5x the average part's value —
    the per-group vs global-scalar HAVING pattern. The threshold is
    AVERAGE-relative, not total-share: Q11's fixed 0.01%% fraction
    selects a data-size-dependent sliver (0 rows past sf0.001 here,
    and the spec itself scales it by 1/SF); 1.5x-mean keeps a stable
    ~1.3%% of parts at every SF, so the test stays live at scale.

    Scale shape: one partial-aggregable groupBy builds the per-part
    values; the global total re-aggregates THAT result (tiny — one row
    per part, not per lineitem) into a single row that broadcasts back
    via a 1-row cross join. The threshold test is exact integer algebra
    (val*1000 > tot in scaled units — no float boundary flake); the
    global accumulator is DECIMAL(38,0) (Spark) / HUGEINT (DuckDB), the
    repo-standard overflow-free money discipline. Display division is
    one IEEE op per surviving row."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        scaled_long(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 10000
        ).alias("rev_s"),
    )
    pv = li.groupBy("l_partkey").agg(F.sum("rev_s").alias("val_s"))
    tot = pv.agg(
        F.sum(F.col("val_s").cast("decimal(38,0)")).alias("tot_s"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        pv.crossJoin(F.broadcast(tot))
        .filter(
            F.col("val_s").cast("decimal(38,0)") * F.lit(2) * F.col("n_parts")
            > F.lit(3) * F.col("tot_s")
        )
        .select(
            "l_partkey",
            (F.col("val_s") / F.lit(10000).cast("double")).alias("part_value"),
        )
    )


@query(
    "sql_supplier_cnt_by_parttype",
    oracle="""
WITH stats AS (
  SELECT SUM(CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT)) AS bal_s,
         COUNT(*) AS n FROM supplier),
excl AS (
  SELECT s_suppkey FROM supplier, stats
  WHERE CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) * n < bal_s),
ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (10, 20, 30, 40, 50)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM excl)
GROUP BY p_brand, p_type, p_size
""",
)
def sql_supplier_cnt_by_parttype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape ("parts/supplier relationship", adapted: the
    part-supplier relation is DISTINCT (l_partkey, l_suppkey) from
    lineitem, and the excluded-supplier subquery — Q16's complaint
    suppliers — is "below-average account balance", computed exactly in
    centi-units so the boundary never flakes across engines): how many
    eligible suppliers can supply each surviving (brand, type, size)
    combination.

    Scale shape: the DISTINCT pair projection shuffles 16 bytes/row
    keyed on the pair; the exclusion list and the filtered part dim both
    broadcast (NOT IN becomes a broadcast left-anti join — null-free
    keys make them equivalent); COUNT(DISTINCT) re-shuffles only the
    surviving pairs on the 3-column group key. No join ever moves
    lineitem text or a non-key column."""
    s = table(spark, sf_dir, "supplier").select(
        "s_suppkey", scaled_long(F.col("s_acctbal"), 100).alias("bal_c")
    )
    stats = s.agg(
        F.sum(F.col("bal_c").cast("decimal(38,0)")).alias("bal_s"),
        F.count(F.lit(1)).alias("n"),
    )
    excl = (
        s.crossJoin(F.broadcast(stats))
        .filter(F.col("bal_c") * F.col("n") < F.col("bal_s"))
        .select("s_suppkey")
    )
    # no explicit DISTINCT: COUNT(DISTINCT l_suppkey) already dedups on
    # (group keys, suppkey) with map-side partial aggregation, so the
    # pre-distinct paid a full extra exchange of the pair projection for
    # a dedup the final aggregate re-does anyway (r10 A/B; the oracle's
    # DISTINCT pair CTE is untouched — duplicate pairs cannot change a
    # distinct count)
    ps = table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(10, 20, 30, 40, 50)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    return (
        ps.join(
            F.broadcast(excl),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "sql_min_cost_supplier",
    oracle="""
WITH s_eu AS (
  SELECT s_suppkey, s_name, n_name FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
q AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost,
         MIN(MIN(l_extendedprice / l_quantity))
           OVER (PARTITION BY l_partkey) AS min_cost
  FROM lineitem JOIN s_eu ON l_suppkey = s_suppkey
  GROUP BY l_partkey, l_suppkey)
SELECT p.p_partkey, p.p_type, s.s_name, s.n_name, q.unit_cost
FROM q
JOIN part p ON p.p_partkey = q.l_partkey
JOIN s_eu s ON s.s_suppkey = q.l_suppkey
WHERE q.unit_cost = q.min_cost AND p.p_size <= 10
""",
)
def sql_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape ("minimum cost supplier", adapted: no partsupp, so
    a supplier's cost for a part is the cheapest unit price it ever
    shipped it at): for each small part (p_size <= 10), every EUROPE
    supplier matching the regional minimum cost — ALL ties survive, as
    in the spec, which is why the plan filters on equality with the
    per-part window minimum instead of electing a single argmin.

    Scale shape: the region dim chain (region⋈nation⋈supplier) collapses
    to a broadcast list BEFORE lineitem is touched, so the fact scan is
    pre-pruned to regional suppliers; one (partkey, suppkey) groupBy
    plus a partkey window re-min reuses the same exchange family (the
    sql_dominant_part_supplier pattern); the part dim broadcasts
    post-filter. Determinism: MIN over doubles both engines computed
    from identical inputs is bit-identical, so the min_cost equality
    never flakes."""
    s_eu = (
        table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(
                table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name")
    )
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit"),
    )
    q = (
        li.join(F.broadcast(s_eu.select("s_suppkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("unit").alias("unit_cost"))
        .withColumn(
            "min_cost",
            F.min("unit_cost").over(Window.partitionBy("l_partkey")),
        )
        .filter(F.col("unit_cost") == F.col("min_cost"))
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 10)
        .select("p_partkey", "p_type")
    )
    return (
        q.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s_eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "p_type", "s_name", "n_name", "unit_cost")
    )


@query(
    "sql_discount_revenue",
    oracle=f"""
SELECT {sql_money_sum("l_extendedprice * l_discount", 10000)} AS discount_revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""",
)
def sql_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape ("forecasting revenue change"): the pure
    scan-filter-aggregate — revenue that would be recovered by dropping
    mid-band discounts on small-quantity 1997 shipments. No join, no
    group key: Q6 exists to prove the scan path, and the plan pin
    asserts all THREE range predicates (date, discount, quantity) reach
    the Parquet scan as PushedFilters — at 100 TB this query is decided
    almost entirely by row-group statistics, reading a fraction of the
    fact table. The discount comparison literals are the same stored
    doubles both engines read, so BETWEEN never flakes."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.04)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        money_sum(F.col("l_extendedprice") * F.col("l_discount"), 10000).alias(
            "discount_revenue"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )


@query(
    "sql_nation_market_share",
    oracle="""
WITH rev AS (
  SELECT year(o_orderdate) AS order_year,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
           AS rev_c,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region    ON cn.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = 'AMERICA')
SELECT CAST(order_year AS BIGINT) AS order_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_c ELSE 0 END)
            AS BIGINT) / CAST(100 AS DOUBLE) AS nation_rev,
       CAST(SUM(rev_c) AS BIGINT) / CAST(100 AS DOUBLE) AS total_rev,
       CAST((1000 * SUM(CASE WHEN supp_nation = 'NATION_3' THEN rev_c ELSE 0 END))
            // SUM(rev_c) AS BIGINT) AS share_milli
FROM rev GROUP BY order_year
""",
)
def sql_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape ("national market share"): of the revenue AMERICA
    customers spent each year, what slice was supplied by NATION_3 —
    the conditional-share-of-a-join pattern. The share is computed in
    exact centi-integer cross terms ((1000·nation) DIV total), so the
    headline milli-share never rides a float boundary; the two display
    sums divide once.

    Scale shape: one lineitem⋈orders⋈customer shuffle chain (the same
    exchanges the flagship already pays); BOTH nation hops, region, and
    supplier broadcast — the customer-region filter prunes the fact
    stream before the aggregate, and the per-year fold is 7 groups with
    full map-side combine. No second pass for the denominator: numerator
    and denominator are conditional sums over ONE stream."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        scaled_long(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 100
        ).alias("rev_c"),
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    cn = table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    rev = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    nat_c = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("rev_c")).otherwise(0)
    )
    tot_c = F.sum("rev_c")
    return (
        rev.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(nat_c.alias("nat_c"), tot_c.alias("tot_c"))
        .select(
            "order_year",
            (F.col("nat_c") / F.lit(100).cast("double")).alias("nation_rev"),
            (F.col("tot_c") / F.lit(100).cast("double")).alias("total_rev"),
            F.expr("(1000 * nat_c) DIV tot_c").alias("share_milli"),
        )
    )


@query(
    "sql_profit_by_nation_year",
    oracle=f"""
SELECT sn.n_name AS supp_nation,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       {sql_money_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY supp_nation, order_year
""",
)
def sql_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape ("product type profit", adapted: no partsupp, so
    no supply cost to subtract — the measure is discounted revenue of
    widget-family parts by supplier nation and order year; the join
    topology IS Q9's: fact → orders for the year, part for the name
    filter, supplier → nation for the group key).

    Scale shape: the p_name LIKE filter prunes part BEFORE it
    broadcasts, and that semi-filters lineitem early; supplier and
    nation broadcast; the only shuffles are lineitem⋈orders and the
    (nation, year) fold. Exact-integer revenue via the shared money
    discipline."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey")
    )
    s = table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(
            "supp_nation", F.year("o_orderdate").cast("long").alias("order_year")
        )
        .agg(
            money_sum(revenue, 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "sql_returned_item_revenue",
    oracle=f"""
SELECT c_custkey, c_name, n_name,
       {sql_money_sum("l_extendedprice * (1 - l_discount)", 10000)} AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1998-01-01'
  AND o_orderdate <  TIMESTAMP '1998-07-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
)
def sql_returned_item_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape ("returned item reporting"): the 20 customers who
    returned the most value in 1998-H1 — the agg-then-global-top-k over
    a star join. The returnflag filter and both order-date bounds push
    into the scans; nation broadcasts; the top-20 must plan as
    TakeOrderedAndProject (per-partition heaps merged on the driver),
    never a global sort — the difference between shuffling 20 rows and
    shuffling every customer at 100 TB. Tie order is pinned by
    (revenue DESC, custkey ASC) so both engines cut the same boundary."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            money_sum(revenue, 10000).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@query(
    "sql_shipmode_priority_count",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
GROUP BY l_linestatus
""",
)
def sql_shipmode_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape ("shipping modes and order priority", adapted:
    this fixture has no l_shipmode/l_receiptdate, so the "mode" is the
    line status and "late" is shipped more than 90 days after the order
    was placed): per status, how many LATE lines belonged to urgent
    orders vs everything else — the query that tells you whether slow
    logistics is eating your priority traffic.

    Scale shape: one lineitem⋈orders equi-join on the order key (the
    lateness predicate is a residual join filter, not a theta join —
    the pair is already keyed); both CASE counts fold in the same
    2-group aggregate with map-side combine. The 90-day arithmetic is
    exact integer timestamp addition in both engines."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linestatus", "l_shipdate"
    )
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.expr("timestampadd(DAY, 90, o_orderdate)"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


@query(
    "sql_promo_revenue_share",
    oracle="""
WITH j AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
           AS rev_c,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01')
SELECT ship_month,
       CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END) AS BIGINT)
         / CAST(100 AS DOUBLE) AS promo_rev,
       CAST(SUM(rev_c) AS BIGINT) / CAST(100 AS DOUBLE) AS total_rev,
       CAST((1000 * SUM(CASE WHEN p_type = 'PROMO' THEN rev_c ELSE 0 END))
            // SUM(rev_c) AS BIGINT) AS promo_milli
FROM j GROUP BY ship_month
""",
)
def sql_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape ("promotion effect"): per 1997 ship month, the
    milli-share of revenue earned by PROMO-type parts. Numerator and
    denominator are conditional sums over ONE joined stream (never two
    passes), in exact centi-integers with a single DIV — the same
    float-free share discipline as sql_nation_market_share.

    Scale shape: the ship-date range pushes into the fact scan; part
    broadcasts (it carries only partkey+type after pruning); 12 month
    groups fold with full map-side combine. DuckDB's date_format and
    Spark's agree byte-for-byte on yyyy-MM."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ship_month"),
        scaled_long(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")), 100
        ).alias("rev_c"),
        "p_type",
    )
    promo = F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev_c")).otherwise(0))
    return (
        j.groupBy("ship_month")
        .agg(promo.alias("promo_c"), F.sum("rev_c").alias("tot_c"))
        .select(
            "ship_month",
            (F.col("promo_c") / F.lit(100).cast("double")).alias("promo_rev"),
            (F.col("tot_c") / F.lit(100).cast("double")).alias("total_rev"),
            F.expr("(1000 * promo_c) DIV tot_c").alias("promo_milli"),
        )
    )


@query(
    "sql_small_quantity_revenue",
    oracle=f"""
WITH pl AS (
  SELECT l_partkey,
         CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
         l_extendedprice
  FROM lineitem),
pa AS (
  SELECT l_partkey, COUNT(*) AS n, CAST(SUM(qc) AS BIGINT) AS sq
  FROM pl GROUP BY l_partkey)
SELECT {sql_money_sum("l_extendedprice", 100)} AS small_qty_revenue,
       COUNT(*) AS n_lines,
       COUNT(DISTINCT pl.l_partkey) AS n_parts
FROM pl
JOIN pa   ON pl.l_partkey = pa.l_partkey
JOIN part ON p_partkey = pl.l_partkey
WHERE p_brand = 'Brand#2' AND qc * 5 * n < sq
""",
)
def sql_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape ("small-quantity-order revenue"): revenue locked
    in Brand#2 order lines whose quantity is below 20% of that part's
    average order quantity — the PER-GROUP correlated-average filter
    (the per-customer twin is sql_correlated_scalar_subquery; this is
    the canonical per-part instance). The 0.2·avg test is exact integer
    cross-multiplication (qc·5·n < Σq), no division anywhere.

    Scale shape: one (partkey) aggregate over the fact, then a
    CO-PARTITIONED join back on the same key — the aggregate output
    rides the exchange the join needs, so the correlated average costs
    one shuffle total; the brand dim broadcasts. Final fold is a 1-row
    global aggregate."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        scaled_long(F.col("l_quantity"), 100).alias("qc"),
        "l_extendedprice",
    )
    pa = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("qc").alias("sq")
    )
    p = (
        table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#2")
        .select("p_partkey")
    )
    return (
        li.join(pa, "l_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qc") * F.lit(5) * F.col("n") < F.col("sq"))
        .agg(
            money_sum(F.col("l_extendedprice"), 100).alias("small_qty_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
    )
