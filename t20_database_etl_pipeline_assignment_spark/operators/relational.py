"""Core relational operators: projections, filters, joins, sorts, set ops.

Reference parity: SURVEY.md §2.B/C/F, derived from the reference's declared
transform surface (reference README.md:10 "extract raw data … transform it
using PySpark … for querying and analysis") and its dimensional model
(README.md:2,6). Everything here is stock DataFrame API — Catalyst gets the
whole plan declaratively, so pushdown/pruning/join-strategy selection are
automatic.

Scale notes (100 TB):
- Dim-side joins (`nation`, `region`, `customer` at dim scale) broadcast;
  fact⋈fact joins shuffle on their keys with AQE skew splitting.
- Non-equi predicates ride on top of an equi key wherever possible
  (join_theta_range keeps l_orderkey=o_orderkey as the hash key, the range
  is a residual filter) — a pure range join at 100 TB would need bucketing.
- Top-k is `orderBy().limit(k)` → Spark's TakeOrderedAndProject: per-partition
  heaps + driver merge of k rows, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import money_sum, ntz_epoch, sql_money_sum
from ..registry import query
from ..sources.tables import table


# ---------------------------------------------------------------------------
# §2.B — projections / filters / predicates
# ---------------------------------------------------------------------------


@query(
    "project_select",
    oracle="""
SELECT l_orderkey AS okey,
       l_linenumber AS line_no,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
""",
)
def project_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return li.select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line_no"),
        revenue.alias("revenue"),
        (revenue * (F.lit(1) + F.col("l_tax"))).alias("charge"),
    )


@query(
    "filter_pred",
    oracle="""
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE o_orderstatus IN ('F', 'P')
  AND o_totalprice BETWEEN 50000 AND 150000
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_custkey IS NOT NULL
""",
)
def filter_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("F", "P")
        & F.col("o_totalprice").between(50000, 150000)
        & (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice")


@query(
    "filter_like",
    oracle="""
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_type LIKE '%PROMO%'
   OR regexp_matches(p_type, '(ECONOMY|STANDARD)')
""",
)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_type").like("%PROMO%") | F.col("p_type").rlike("(ECONOMY|STANDARD)")
    ).select("p_partkey", "p_name", "p_type")


@query(
    "case_when",
    oracle=f"""
SELECT CASE WHEN o_totalprice > 250000 THEN 'big'
            WHEN o_totalprice > 100000 THEN 'mid'
            ELSE 'small' END AS bucket,
       COUNT(*) AS n_orders,
       {sql_money_sum("o_totalprice")} AS total
FROM orders
GROUP BY bucket
""",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") > 250000, "big")
        .when(F.col("o_totalprice") > 100000, "mid")
        .otherwise("small")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        money_sum(F.col("o_totalprice")).alias("total"),
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "customer").select("c_mktsegment", "c_nationkey").distinct()


# ---------------------------------------------------------------------------
# §2.C — joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_equi",
    oracle="""
SELECT o_orderkey, c_name, c_mktsegment, o_totalprice
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, F.col("o_custkey") == F.col("c_custkey"), "inner").select(
        "o_orderkey", "c_name", "c_mktsegment", "o_totalprice"
    )


@query(
    "join_left_outer",
    oracle=f"""
SELECT c_custkey,
       COUNT(o_orderkey) AS n_orders,
       COALESCE({sql_money_sum("o_totalprice")}, 0.0) AS total_spent
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(money_sum(F.col("o_totalprice")), F.lit(0.0)).alias("total_spent"),
        )
    )


@query(
    "join_full_outer",
    oracle="""
WITH old AS (SELECT c_custkey AS k, c_acctbal AS old_bal FROM customer WHERE c_custkey % 2 = 0),
     new AS (SELECT c_custkey AS k, c_acctbal + 100.0 AS new_bal FROM customer WHERE c_custkey % 3 = 0)
SELECT COALESCE(old.k, new.k) AS k,
       old_bal,
       new_bal,
       old.k IS NOT NULL AS in_old,
       new.k IS NOT NULL AS in_new
FROM old FULL OUTER JOIN new ON old.k = new.k
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    old = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k_old"), F.col("c_acctbal").alias("old_bal")
    )
    new = c.filter(F.col("c_custkey") % 3 == 0).select(
        F.col("c_custkey").alias("k_new"), (F.col("c_acctbal") + F.lit(100.0)).alias("new_bal")
    )
    return old.join(new, F.col("k_old") == F.col("k_new"), "full_outer").select(
        F.coalesce("k_old", "k_new").alias("k"),
        "old_bal",
        "new_bal",
        F.col("k_old").isNotNull().alias("in_old"),
        F.col("k_new").isNotNull().alias("in_new"),
    )


@query(
    "join_left_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@query(
    "join_left_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS — also the new-key detection primitive inside incremental
    load (reference README.md:4 "incremental load … to handle large datasets")."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_broadcast",
    oracle="""
SELECT c_mktsegment, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast hint: at 100 TB the fact side never shuffles for a
    dim join — the dim ships to every executor (reference README.md:8)."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "join_theta_range",
    oracle=f"""
SELECT o_orderpriority,
       COUNT(*) AS n_lines,
       {sql_money_sum("l_extendedprice")} AS total_price
FROM lineitem JOIN orders
  ON l_orderkey = o_orderkey
 AND l_shipdate >= o_orderdate
 AND l_shipdate < o_orderdate + INTERVAL 90 DAY
GROUP BY o_orderpriority
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi range predicate riding on an equi hash key: Catalyst keeps
    l_orderkey=o_orderkey as the join key and evaluates the date range as a
    residual — no quadratic blowup at scale."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    cond = (
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.col("o_orderdate"))
        & (F.col("l_shipdate") < F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
    )
    return (
        li.join(o, cond)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            money_sum(F.col("l_extendedprice")).alias("total_price"),
        )
    )


@query(
    "join_asof_scd2",
    oracle="""
WITH dim AS (
  SELECT c_custkey AS k, c_acctbal AS bal,
         TIMESTAMP '1990-01-01' AS eff_from,
         CASE WHEN c_custkey % 2 = 0 THEN TIMESTAMP '1998-01-01'
              ELSE TIMESTAMP '9999-12-31' END AS eff_to
  FROM customer
  UNION ALL
  SELECT c_custkey, c_acctbal + 50.0,
         TIMESTAMP '1998-01-01', TIMESTAMP '9999-12-31'
  FROM customer WHERE c_custkey % 2 = 0
)
SELECT o_orderkey, o_custkey, bal AS bal_at_order,
       eff_from AS version_from
FROM orders JOIN dim
  ON o_custkey = k AND o_orderdate >= eff_from AND o_orderdate < eff_to
""",
)
def join_asof_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: each fact row resolves to the dimension
    version valid at fact time — the SCD2 lookup shape (reference README.md:6
    "enabling historical analysis"). The versioned dim is derived
    deterministically from `customer` so the oracle sees identical inputs.

    Scale: the versioned dim is usually dim-sized → broadcast; if not,
    bucket both sides by key so the range predicate is a residual."""
    c = table(spark, sf_dir, "customer")
    v1 = c.select(
        F.col("c_custkey").alias("k"),
        F.col("c_acctbal").alias("bal"),
        F.lit("1990-01-01").cast("timestamp").alias("eff_from"),
        F.when(F.col("c_custkey") % 2 == 0, F.lit("1998-01-01"))
        .otherwise(F.lit("9999-12-31"))
        .cast("timestamp")
        .alias("eff_to"),
    )
    v2 = c.filter(F.col("c_custkey") % 2 == 0).select(
        F.col("c_custkey").alias("k"),
        (F.col("c_acctbal") + F.lit(50.0)).alias("bal"),
        F.lit("1998-01-01").cast("timestamp").alias("eff_from"),
        F.lit("9999-12-31").cast("timestamp").alias("eff_to"),
    )
    dim = v1.unionByName(v2)
    o = table(spark, sf_dir, "orders")
    cond = (
        (F.col("o_custkey") == F.col("k"))
        & (F.col("o_orderdate") >= F.col("eff_from"))
        & (F.col("o_orderdate") < F.col("eff_to"))
    )
    return o.join(F.broadcast(dim), cond).select(
        "o_orderkey",
        "o_custkey",
        F.col("bal").alias("bal_at_order"),
        F.col("eff_from").alias("version_from"),
    )


# ---------------------------------------------------------------------------
# §2.F — sorts / limits / top-k / set operations
# ---------------------------------------------------------------------------


@query(
    "sort_multikey",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice
FROM orders
ORDER BY o_orderpriority ASC NULLS LAST, o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def sort_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return (
        o.orderBy(
            F.asc_nulls_last("o_orderpriority"),
            F.desc("o_totalprice"),
            F.asc("o_orderkey"),
        )
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .limit(100)
    )


@query(
    "topk_global",
    oracle="""
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
LIMIT 50
""",
)
def topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k without a global sort: TakeOrderedAndProject keeps a
    k-row heap per partition and merges k·P rows on the driver."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(F.desc("l_extendedprice"), F.asc("l_orderkey"), F.asc("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(50)
    )


@query(
    "set_union_all",
    oracle="""
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'F'
UNION ALL
SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    return o.filter(F.col("o_orderstatus") == "F").unionByName(
        o.filter(F.col("o_orderstatus") == "O")
    )


@query(
    "set_union_distinct",
    oracle="""
SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
UNION
SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
""",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    return (
        c.filter(F.col("c_custkey") % 2 == 0)
        .unionByName(c.filter(F.col("c_custkey") % 3 == 0))
        .distinct()
    )


@query(
    "set_intersect",
    oracle="""
SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
INTERSECT
SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
""",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    return c.filter(F.col("c_custkey") % 2 == 0).intersect(
        c.filter(F.col("c_custkey") % 3 == 0)
    )


@query(
    "set_except",
    oracle="""
SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0
EXCEPT
SELECT c_custkey FROM customer WHERE c_custkey % 3 = 0
""",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer").select("c_custkey")
    return c.filter(F.col("c_custkey") % 2 == 0).subtract(
        c.filter(F.col("c_custkey") % 3 == 0)
    )


_SALT_BUCKETS = 32


@query(
    "join_skew_salted",
    oracle=f"""
SELECT n_name,
       COUNT(*) AS n_orders,
       {sql_money_sum("o_totalprice")} AS total
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated join via TARGETED key salting — the manual counterpart
    to AQE's skew-join split, for when a single hot key (a celebrity user, a
    default/null-like key) overwhelms one reducer at 100 TB.

    Round-6 skew-tier measurement (BENCH_SCALING.json → skew) showed why
    blanket salting is the wrong production shape: replicating the WHOLE
    dim once per salt bucket raised every reducer's median (p50 0.41→0.56 s
    on the hot fixture) while the hot key still spread over only
    `_SALT_BUCKETS` of the shuffle's partitions. Targeted form: one cheap
    partial-aggregable census pass finds the keys whose row count exceeds a
    fair bucket share (> total/B); ONLY rows carrying a hot key get a
    deterministic per-row salt in [0, B), and ONLY the hot keys' dim rows
    are replicated B× (a handful of rows, not the dim — at 100 TB a
    1.5 B-row dim cannot be blanket-replicated, while hot-keys × B stays
    trivially broadcastable). Cold keys keep salt 0, so their reducer
    placement and per-task cost are IDENTICAL to the unsalted join. The
    join key becomes (key, salt), spreading each hot key over B reducers.
    Results are identical to the unsalted join — the oracle checks exactly
    that. Salt is xxhash64-derived from the row's own keys: deterministic,
    no RNG, stable under retries/speculative execution. At 100 TB the
    census comes from table stats or a 0.1 % sample instead of an exact
    pass; exact keeps this self-contained and the threshold semantics are
    the same.
    """
    o = table(spark, sf_dir, "orders")
    # hot-key census: keys owning more than a fair bucket share of rows
    total = o.agg(F.count(F.lit(1)).alias("n_total"))  # lazy 1-row broadcast
    hot = (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_key"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_key") * _SALT_BUCKETS > F.col("n_total"))
        .select(F.col("o_custkey").alias("hot_key"), F.lit(True).alias("is_hot"))
    )
    op = (
        o.join(F.broadcast(hot), o["o_custkey"] == F.col("hot_key"), "left")
        .withColumn(
            "salt",
            F.when(
                F.col("is_hot"),
                F.pmod(F.xxhash64("o_orderkey"), F.lit(_SALT_BUCKETS)),
            )
            .otherwise(F.lit(0))
            .cast("int"),
        )
        .drop("hot_key", "is_hot")
    )
    c = (
        table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey")
        .join(F.broadcast(hot), F.col("c_custkey") == F.col("hot_key"), "left")
        .withColumn(
            "salt",
            F.explode(
                F.when(
                    F.col("is_hot"),
                    F.sequence(F.lit(0), F.lit(_SALT_BUCKETS - 1)),
                ).otherwise(F.array(F.lit(0)))
            ),
        )
        .drop("hot_key", "is_hot")
    )
    n = table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        op.join(c, on=[op["o_custkey"] == c["c_custkey"], op["salt"] == c["salt"]])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money_sum(F.col("o_totalprice")).alias("total"),
        )
    )


_RANGE_SECS = 300  # 5-minute blast-radius horizon == the bucket width


@query(
    "join_range_bucketed",
    oracle=f"""
SELECT a.event_id AS error_id, b.event_id AS event_id,
       epoch_us(b.ts) - epoch_us(a.ts) AS lag_us
FROM (SELECT * FROM events WHERE event_type = 'error') a
JOIN events b
  ON b.ts >= a.ts
 AND b.ts < a.ts + INTERVAL {_RANGE_SECS} SECOND
 AND b.event_id <> a.event_id
""",
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PURE interval join (no equi key): every event within 5 minutes after
    each error event — error blast-radius analysis. Naively this is a
    cartesian product with a range filter, the join shape that melts down at
    100 TB. Scale formulation: discretize time into horizon-width buckets;
    each anchor covers ≤2 buckets (explode bounded by horizon/bucket, never
    by data size), each probe row has exactly one bucket; hash-join on the
    bucket key with the exact range as a residual. Cost: 2|anchors| +
    |events| shuffled on bucket keys, vs |anchors|×|events| cartesian. Same
    technique stream processors use for interval joins. The oracle runs the
    naive formulation (fine at fixture scale) — results must be identical.
    """
    e = table(spark, sf_dir, "events")
    bucket_of = lambda c: (  # noqa: E731
        F.timestamp_diff("SECOND", ntz_epoch(), c) / _RANGE_SECS
    ).cast("long")
    anchors = (
        e.filter(F.col("event_type") == "error")
        .select(
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("a_ts"),
            F.explode(
                F.sequence(bucket_of(F.col("ts")), bucket_of(F.col("ts")) + 1)
            ).alias("bucket"),
        )
    )
    probes = e.select("event_id", "ts", bucket_of(F.col("ts")).alias("bucket"))
    return (
        anchors.join(probes, "bucket")
        .filter(
            (F.col("ts") >= F.col("a_ts"))
            & (F.col("ts") < F.col("a_ts") + F.expr(f"INTERVAL {_RANGE_SECS} SECONDS"))
            & (F.col("event_id") != F.col("error_id"))
        )
        .select(
            "error_id",
            "event_id",
            F.timestamp_diff("MICROSECOND", F.col("a_ts"), F.col("ts")).alias("lag_us"),
        )
    )


@query(
    "join_null_safe",
    oracle="""
WITH a AS (SELECT nullif(c_nationkey % 5, 0) AS grp, c_custkey FROM customer),
b AS (SELECT nullif(n_nationkey % 5, 0) AS grp, n_nationkey FROM nation)
SELECT a.grp AS grp, COUNT(*) AS n_pairs,
       CAST(SUM(c_custkey) AS BIGINT) AS key_sum
FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
GROUP BY a.grp
""",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (`<=>` / IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantics a
    dimensional pipeline needs when 'unknown' is itself a join bucket
    (reference README.md:12 "data integrity"). NULL-heavy keys are also the
    canonical skew hazard: at 100 TB the NULL bucket gets salted
    (join_skew_salted) or split by AQE.
    """
    c = table(spark, sf_dir, "customer").select(
        F.nullif(F.col("c_nationkey") % 5, F.lit(0)).alias("grp"), "c_custkey"
    )
    n = table(spark, sf_dir, "nation").select(
        F.nullif(F.col("n_nationkey") % 5, F.lit(0)).alias("n_grp"), "n_nationkey"
    )
    return (
        c.join(n, c["grp"].eqNullSafe(n["n_grp"]))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("c_custkey").alias("key_sum"),
        )
    )


@query(
    "set_except_all",
    oracle="""
SELECT c_nationkey FROM customer WHERE c_custkey % 2 = 0
EXCEPT ALL
SELECT c_nationkey FROM customer WHERE c_custkey % 4 = 0
""",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference (EXCEPT ALL): per-value multiplicities subtract
    instead of collapsing to distinct — the correct audit semantics when
    counting what a load dropped. Spark implements it as a counted
    anti-aggregation (no quadratic anything)."""
    c = table(spark, sf_dir, "customer").select("c_nationkey", "c_custkey")
    evens = c.filter(F.col("c_custkey") % 2 == 0).select("c_nationkey")
    fours = c.filter(F.col("c_custkey") % 4 == 0).select("c_nationkey")
    return evens.exceptAll(fours)


@query(
    "reshape_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_extendedprice' AS measure, l_extendedprice AS val
FROM lineitem
UNION ALL
SELECT l_orderkey, l_linenumber, 'l_discount' AS measure, l_discount AS val
FROM lineitem
""",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (`unpivot`/melt — the inverse of agg_pivot): three
    measure columns become (measure, val) rows keyed by the line id. Narrow
    map-only plan (each input row emits 3 output rows, no shuffle); the
    long format is what generic quality-profiling and metric-sink stages
    consume. Oracle is the equivalent UNION ALL."""
    li = table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )


_BLOOM_BITS = 1 << 20  # 1M bits → 16k 64-bit words
_BLOOM_HASHES = 3


@query(
    "join_bloom_prefilter",
    oracle="""
SELECT o.o_custkey AS c_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS spend_cents
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE c.c_mktsegment = 'BUILDING'
GROUP BY o.o_custkey
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit runtime-filter join: a Bloom filter built from the
    filtered dimension's keys prunes fact rows BEFORE the join — the
    row-level runtime filtering engines apply when the dimension predicate
    is selective but the fact scan can't push it down. The Bloom pass is a
    pure optimization: false positives die in the exact join that
    follows, so the result — and the oracle — is the plain join, which is
    the whole point of the pattern.

    Construction is engine-exact and shuffle-light: keys hash into
    3 positions of a 2^20-bit array stored as 64-bit words
    (bit_or aggregate per word — the same mergeable-bitmap machinery as
    agg_bitmap_distinct); the word table (16k rows) broadcasts, and each
    probe is {_BLOOM_HASHES} broadcast lookups + bit tests fused into the
    fact scan projection. At 100 TB the filter ships once per executor
    (128 KB) while the dimension hash table for the real join may be
    orders of magnitude larger after attributes — the asymmetry that
    makes the prefilter pay."""
    dim = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    fact = table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")

    def positions(key: Column) -> list[Column]:
        return [
            F.pmod(F.xxhash64(key, F.lit(i)), F.lit(_BLOOM_BITS))
            for i in range(_BLOOM_HASHES)
        ]

    # build: (word_idx, or-of-bits) — one tiny shuffle on word_idx
    bits = dim.select(
        F.explode(F.array(*positions(F.col("c_custkey")))).alias("pos")
    )
    words = bits.groupBy(F.expr("pos div 64").alias("w")).agg(
        F.bit_or(
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))")
        ).alias("bits")
    )
    # probe: 3 broadcast equi-joins on the word index, all bits must hit
    probed = fact
    for i, pos in enumerate(positions(F.col("o_custkey"))):
        probed = (
            probed.withColumn(f"_p{i}", pos)
            .join(
                F.broadcast(words.select(F.col("w").alias(f"_w{i}"),
                                         F.col("bits").alias(f"_b{i}"))),
                F.expr(f"_p{i} div 64") == F.col(f"_w{i}"),
                "left",
            )
            .filter(
                F.expr(
                    f"coalesce((shiftright(_b{i}, CAST(_p{i} % 64 AS INT)) & 1), 0) = 1"
                )
            )
            .drop(f"_p{i}", f"_w{i}", f"_b{i}")
        )
    # exact join kills Bloom false positives; result == plain join
    return (
        probed.join(F.broadcast(dim), probed["o_custkey"] == dim["c_custkey"])
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("spend_cents"),
        )
    )


@query(
    "set_intersect_all",
    oracle="""
SELECT c_nationkey FROM customer WHERE c_custkey % 2 = 0
INTERSECT ALL
SELECT c_nationkey FROM customer WHERE c_custkey % 3 = 0
""",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersection (INTERSECT ALL): per-value multiplicities take
    the MINIMUM of the two sides — completes the bag-semantics set-op
    family next to set_except_all. Spark plans the same partial-count +
    single hash shuffle as the distinct variant; at scale the cost is one
    exchange on the value, like any aggregation."""
    c = table(spark, sf_dir, "customer")
    a = c.filter(F.col("c_custkey") % 2 == 0).select("c_nationkey")
    b = c.filter(F.col("c_custkey") % 3 == 0).select("c_nationkey")
    return a.intersectAll(b)
