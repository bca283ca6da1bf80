"""Advanced analytics operators (SURVEY.md §2.L round-3 extension; reference
README.md:10 "transform it using PySpark" / README.md:8 partitioning+cluster
tuning): batch sessionization, EWMA smoothing, Pareto skylines, exact
correlation matrices, column profiling, concentration scoring, MAD anomaly
detection, weighted medians, event-path mining, a Z-order clustering audit,
RFM segmentation, time-weighted averages, rolling medians, a data-freshness
monitor, CUSUM change-point detection, Bollinger bands, max drawdown,
weekday seasonality, market-basket association rules, linear-interpolation
resampling, integer-exact burst detection, reorder-interval percentiles,
and the Gini spend-inequality coefficient — plus the implemented 100 TB
scale tiers of the exact operators (profile_columns_approx,
rfm_score_by_cutoffs, mad_summary_approx, write_zordered).

Scale design (100 TB):
- Every windowed operator partitions by a real key (user_id, brand,
  returnflag, event_type) — no single-partition global windows anywhere.
- Global top-k queries end in ORDER BY + LIMIT so Spark plans
  TakeOrderedAndProject (per-partition heaps + driver merge), never a
  full sort.
- All aggregation-heavy paths sum exact scaled integers (exprs.scaled_long)
  so results are bit-identical across engines AND never drift across
  billions of rows; wide products that could overflow int64 accumulate in
  decimal(38,0) (Spark) / int128 (DuckDB) before one final double cast.
- The Z-order audit derives its bucket from the code's fixed bit prefix —
  a pure projection — so clustering-quality stats need one keyed shuffle,
  not a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import epoch_us, scaled_long, sql_scaled_long
from ..registry import query
from ..sources.tables import table

# ---------------------------------------------------------------------------
# sessionize_batch
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 1_800_000_000  # 30 minutes


@query(
    "sessionize_batch",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         {sql_scaled_long('value', 100)} AS v_c
  FROM events
),
g AS (
  SELECT user_id, event_id, us, v_c,
         CASE WHEN us - lag(us) OVER w > {_SESSION_GAP_US} OR
                   lag(us) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
s AS (
  SELECT user_id, event_id, us, v_c,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS BIGINT) AS session_seq
  FROM g
)
SELECT user_id, session_seq,
       COUNT(*) AS n_events,
       MIN(us) AS start_us,
       MAX(us) AS end_us,
       MAX(us) - MIN(us) AS duration_us,
       (SUM(v_c) / 100.0) AS sum_value
FROM s
GROUP BY user_id, session_seq
""",
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: the classic gap-based session assignment
    (a new session starts after >30 min of inactivity), the batch twin of
    streaming/windows.py stream_session. Lag-flag + running-sum gives each
    event a per-user session ordinal in ONE shuffle on user_id; the session
    rollup then aggregates on the same (user_id, session_seq) key, so at
    100 TB the whole operator is a single hash-partition of the event log
    followed by map-side-combinable aggregation. Event-time arithmetic in
    exact epoch microseconds; money sums as scaled integers."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("us"),
        scaled_long(F.col("value"), 100).alias("v_c"),
    )
    return sessionize(e)


def assign_session_seq(e: DataFrame, gap_us: int = _SESSION_GAP_US) -> DataFrame:
    """Event-level session assignment (gap-flag + running sum): input rows
    gain a per-user `session_seq` column, all other columns pass through.
    THE single definition of what a session is — sessionize() and
    session_conversion_by_length both build on it, so a change to the gap
    boundary or tie order can never make the two disagree."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    g = e.withColumn(
        "new_session",
        F.when(
            (F.col("us") - F.lag("us").over(w) > gap_us)
            | F.lag("us").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    return g.withColumn("session_seq", F.sum("new_session").over(run)).drop(
        "new_session"
    )


def sessionize(e: DataFrame, gap_us: int = _SESSION_GAP_US) -> DataFrame:
    """The sessionization kernel on a (user_id, event_id, us, v_c)
    relation — separated from the fixture scan so property-based tests can
    model-check it on generated streams (tests/test_analytics_ops.py)."""
    s = assign_session_seq(e, gap_us)
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
        (F.sum("v_c") / F.lit(100.0)).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# win_ewma
# ---------------------------------------------------------------------------

_EWMA_WEIGHTS = [1.0, 0.5, 0.25, 0.125, 0.0625]  # alpha=0.5, exact powers of 2


def _ewma_terms_sql() -> tuple[str, str]:
    num = ["value"]
    den = ["1.0"]
    for i, wgt in enumerate(_EWMA_WEIGHTS[1:], start=1):
        num.append(f"COALESCE(lag(value, {i}) OVER w, 0.0) * {wgt}")
        den.append(f"CASE WHEN lag(value, {i}) OVER w IS NULL THEN 0.0 ELSE {wgt} END")
    return " + ".join(num), " + ".join(den)


_EWMA_NUM_SQL, _EWMA_DEN_SQL = _ewma_terms_sql()


@query(
    "win_ewma",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us, value
  FROM events
)
SELECT user_id, event_id, us, value,
       ({_EWMA_NUM_SQL}) / ({_EWMA_DEN_SQL}) AS ewma
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
""",
)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average (alpha=0.5) of event values per
    user, truncated to the last 5 observations and renormalized over the
    weights actually present (so early rows aren't biased toward zero).
    Weights are exact powers of two, so each product only shifts the double's
    exponent (no rounding), and the numerator/denominator are written as the
    SAME left-to-right addition chain in Spark and the oracle — bit-identical
    without tolerance. One partitioned window shuffle on user_id; bounded
    lag depth keeps per-row state O(1) regardless of history length, the
    property that matters on an unbounded 100 TB event log."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", epoch_us("ts").alias("us"), "value"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    num: Column = F.col("value")
    den: Column = F.lit(1.0)
    for i, wgt in enumerate(_EWMA_WEIGHTS[1:], start=1):
        lagged = F.lag("value", i).over(w)
        num = num + F.coalesce(lagged, F.lit(0.0)) * F.lit(wgt)
        den = den + F.when(lagged.isNull(), F.lit(0.0)).otherwise(F.lit(wgt))
    return e.select(
        "user_id", "event_id", "us", "value", (num / den).alias("ewma")
    )


# ---------------------------------------------------------------------------
# skyline_pareto
# ---------------------------------------------------------------------------


@query(
    "skyline_pareto",
    oracle=f"""
WITH p AS (
  SELECT p_brand, p_partkey, p_size, p_retailprice,
         {sql_scaled_long('p_retailprice', 100)} AS price_c
  FROM part
),
s AS (
  SELECT p_brand, p_partkey, p_size, p_retailprice,
         MAX(p_size) OVER (PARTITION BY p_brand ORDER BY price_c
                           RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_cheaper_size
  FROM p
)
SELECT p_brand, p_partkey, p_size, p_retailprice
FROM s
WHERE best_cheaper_size IS NULL OR best_cheaper_size <= p_size
""",
)
def skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pareto skyline over (minimize retailprice, maximize size):
    a part survives unless a STRICTLY cheaper part of the same brand has a
    STRICTLY larger size. Computed as a single range-window sweep — max size
    over all strictly-cheaper rows (RANGE … 1 PRECEDING on exact cent
    integers) — instead of the naive O(n²) self-join NOT EXISTS. Windows
    partition by brand, so the shuffle is keyed and the per-group sort is
    local; the sweep is O(n log n) per brand and holds at any scale. Exact
    cent arithmetic makes the strictness test engine-independent."""
    p = table(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        "p_size",
        "p_retailprice",
        scaled_long(F.col("p_retailprice"), 100).alias("price_c"),
    )
    w = (
        Window.partitionBy("p_brand")
        .orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    s = p.withColumn("best_cheaper_size", F.max("p_size").over(w))
    keep = F.col("best_cheaper_size").isNull() | (
        F.col("best_cheaper_size") <= F.col("p_size")
    )
    return s.filter(keep).select("p_brand", "p_partkey", "p_size", "p_retailprice")


# ---------------------------------------------------------------------------
# agg_corr_matrix
# ---------------------------------------------------------------------------


def _sql_corr(n: str, sx: str, sy: str, sxy: str, sxx: str, syy: str) -> str:
    return (
        f"(({n} * {sxy} - {sx} * {sy}) / "
        f"sqrt(({n} * {sxx} - {sx} * {sx}) * ({n} * {syy} - {sy} * {sy})))"
    )


@query(
    "agg_corr_matrix",
    oracle=f"""
WITH s AS (
  SELECT {sql_scaled_long('l_quantity', 100)} AS q,
         {sql_scaled_long('l_extendedprice', 100)} AS p,
         {sql_scaled_long('l_discount', 100)} AS d
  FROM lineitem
),
a AS (
  -- int128 -> double via VARCHAR: DuckDB's direct HUGEINT->DOUBLE cast
  -- truncates instead of rounding to nearest, while Spark's
  -- decimal->double (and strtod) round correctly; the string hop makes
  -- both engines correctly rounded, hence bit-identical.
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(CAST(SUM(q) AS VARCHAR) AS DOUBLE) AS sq,
         CAST(CAST(SUM(p) AS VARCHAR) AS DOUBLE) AS sp,
         CAST(CAST(SUM(d) AS VARCHAR) AS DOUBLE) AS sd,
         CAST(CAST(SUM(CAST(q AS HUGEINT) * q) AS VARCHAR) AS DOUBLE) AS sqq,
         CAST(CAST(SUM(CAST(p AS HUGEINT) * p) AS VARCHAR) AS DOUBLE) AS spp,
         CAST(CAST(SUM(CAST(d AS HUGEINT) * d) AS VARCHAR) AS DOUBLE) AS sdd,
         CAST(CAST(SUM(CAST(q AS HUGEINT) * p) AS VARCHAR) AS DOUBLE) AS sqp,
         CAST(CAST(SUM(CAST(q AS HUGEINT) * d) AS VARCHAR) AS DOUBLE) AS sqd,
         CAST(CAST(SUM(CAST(p AS HUGEINT) * d) AS VARCHAR) AS DOUBLE) AS spd
  FROM s
)
SELECT CAST(n AS BIGINT) AS n,
       {_sql_corr('n', 'sq', 'sp', 'sqp', 'sqq', 'spp')} AS corr_qty_price,
       {_sql_corr('n', 'sq', 'sd', 'sqd', 'sqq', 'sdd')} AS corr_qty_disc,
       {_sql_corr('n', 'sp', 'sd', 'spd', 'spp', 'sdd')} AS corr_price_disc
FROM a
""",
)
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation matrix over lineitem (quantity,
    extendedprice, discount) from ONE scan: all nine moment sums accumulate
    in a single partial-aggregable pass, as exact integers — cross products
    that could overflow int64 at 100 TB row counts (price² × billions) are
    summed in decimal(38,0) (Spark) / int128 (DuckDB). The correlation
    itself is one identical double expression over identical exact sums, so
    both engines agree to the bit without tolerance. The fixed scaling of
    each column cancels in Pearson r. Contrast with calling F.corr three
    times: same answer at small scale, but order-dependent double
    accumulation that drifts across a 1000-executor reduce tree."""
    li = table(spark, sf_dir, "lineitem").select(
        scaled_long(F.col("l_quantity"), 100).alias("q"),
        scaled_long(F.col("l_extendedprice"), 100).alias("p"),
        scaled_long(F.col("l_discount"), 100).alias("d"),
    )
    dec = "decimal(38,0)"

    def s(c: str) -> Column:
        return F.sum(F.col(c)).cast("double")

    def s2(a: str, b: str) -> Column:
        return F.sum((F.col(a).cast(dec) * F.col(b)).cast(dec)).cast("double")

    a = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        s("q").alias("sq"),
        s("p").alias("sp"),
        s("d").alias("sd"),
        s2("q", "q").alias("sqq"),
        s2("p", "p").alias("spp"),
        s2("d", "d").alias("sdd"),
        s2("q", "p").alias("sqp"),
        s2("q", "d").alias("sqd"),
        s2("p", "d").alias("spd"),
    )

    def corr(sx: str, sy: str, sxy: str, sxx: str, syy: str) -> Column:
        n = F.col("n")
        cov = n * F.col(sxy) - F.col(sx) * F.col(sy)
        vx = n * F.col(sxx) - F.col(sx) * F.col(sx)
        vy = n * F.col(syy) - F.col(sy) * F.col(sy)
        return cov / F.sqrt(vx * vy)

    return a.select(
        F.col("n").cast("long").alias("n"),
        corr("sq", "sp", "sqp", "sqq", "spp").alias("corr_qty_price"),
        corr("sq", "sd", "sqd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("sp", "sd", "spd", "spp", "sdd").alias("corr_price_disc"),
    )


# ---------------------------------------------------------------------------
# profile_columns
# ---------------------------------------------------------------------------

_PROFILE_COLS = [
    ("c_custkey", "CAST(c_custkey AS VARCHAR)"),
    ("c_name", "c_name"),
    ("c_nationkey", "CAST(c_nationkey AS VARCHAR)"),
    ("c_acctbal_cents", None),  # profiled on exact cents (see docstring)
    ("c_mktsegment", "c_mktsegment"),
]


@query(
    "profile_columns",
    oracle="""
WITH c AS (
  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS c_acctbal_cents
  FROM customer
)
SELECT 'c_custkey' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(c_custkey) AS n_nulls,
       COUNT(DISTINCT c_custkey) AS n_distinct,
       CAST(MIN(c_custkey) AS VARCHAR) AS min_val,
       CAST(MAX(c_custkey) AS VARCHAR) AS max_val
FROM c
UNION ALL
SELECT 'c_name', COUNT(*), COUNT(*) - COUNT(c_name), COUNT(DISTINCT c_name),
       MIN(c_name), MAX(c_name) FROM c
UNION ALL
SELECT 'c_nationkey', COUNT(*), COUNT(*) - COUNT(c_nationkey),
       COUNT(DISTINCT c_nationkey),
       CAST(MIN(c_nationkey) AS VARCHAR), CAST(MAX(c_nationkey) AS VARCHAR) FROM c
UNION ALL
SELECT 'c_acctbal_cents', COUNT(*), COUNT(*) - COUNT(c_acctbal_cents),
       COUNT(DISTINCT c_acctbal_cents),
       CAST(MIN(c_acctbal_cents) AS VARCHAR), CAST(MAX(c_acctbal_cents) AS VARCHAR)
FROM c
UNION ALL
SELECT 'c_mktsegment', COUNT(*), COUNT(*) - COUNT(c_mktsegment),
       COUNT(DISTINCT c_mktsegment), MIN(c_mktsegment), MAX(c_mktsegment) FROM c
""",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-profiling pass over customer: per column, row count, null count,
    exact distinct count, and min/max — the standard pre-ingest audit an ETL
    pipeline runs on a new source (reference README.md:12 data integrity).
    ONE scan computes every statistic (Spark's multi-count-distinct planning
    handles the expand); the wide single-row aggregate is then unpivoted to
    the long (col_name, stats) shape with stack — a pure projection. Doubles
    are profiled on exact cents so min/max render identically in both
    engines (double→string formatting is engine-specific; integers aren't).
    At 100 TB the exact distincts become the cost center — the scale
    swap -- implemented as profile_columns_approx below -- uses
    approx_count_distinct, which drops the expand entirely."""
    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        scaled_long(F.col("c_acctbal"), 100).alias("c_acctbal_cents"),
    )
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal_cents", "c_mktsegment"]
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"),
            F.count_distinct(F.col(col)).alias(f"{col}__distinct"),
            F.min(col).cast("string").alias(f"{col}__min"),
            F.max(col).cast("string").alias(f"{col}__max"),
        ]
    wide = c.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        for col in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_val, max_val)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


# ---------------------------------------------------------------------------
# text_gini_concentration
# ---------------------------------------------------------------------------


@query(
    "text_gini_concentration",
    oracle="""
WITH w AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word
  FROM documents
),
wc AS (
  SELECT doc_id, word, COUNT(*) AS cnt
  FROM w WHERE word <> ''
  GROUP BY doc_id, word
),
d AS (
  SELECT doc_id,
         SUM(cnt) AS n_words,
         COUNT(*) AS n_distinct_words,
         SUM(CAST(cnt AS HUGEINT) * cnt) AS sum_sq
  FROM wc GROUP BY doc_id
)
SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       n_distinct_words,
       -- VARCHAR hop: DuckDB HUGEINT->DOUBLE truncates; string parse
       -- rounds to nearest like Spark's decimal->double (see
       -- agg_corr_matrix). Exact below 2^53 either way; this keeps the
       -- score bit-stable on pathologically long documents too.
       (1.0 - CAST(CAST(sum_sq AS VARCHAR) AS DOUBLE) /
              (CAST(n_words AS DOUBLE) * CAST(n_words AS DOUBLE))) AS gini
FROM d
""",
)
def text_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document word-concentration Gini impurity,
    1 − Σ(cntᵢ²)/n², a log-free lexical-diversity score for corpus quality
    filtering (0 = one word repeated, →1 = all words distinct). Chosen over
    Shannon entropy deliberately: entropy needs log(), whose last-ulp
    behavior differs across libm implementations, while Gini is a single
    double expression over exact integer sums — bit-identical on any
    engine. Plan shape: explode → two aggregations both keyed by doc_id, so
    the second groupBy reuses the first shuffle's partitioning (zero extra
    exchanges); linear in corpus size, the shape that holds at 100 TB.
    Squares accumulate in decimal(38,0)/int128 so pathological single-word
    documents can't overflow."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("word")
    ).filter(F.col("word") != "")
    wc = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    d = wc.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_words"),
        F.count(F.lit(1)).alias("n_distinct_words"),
        F.sum((F.col("cnt").cast("decimal(38,0)") * F.col("cnt")).cast("decimal(38,0)"))
        .alias("sum_sq"),
    )
    n = F.col("n_words").cast("double")
    return d.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "n_distinct_words",
        (F.lit(1.0) - F.col("sum_sq").cast("double") / (n * n)).alias("gini"),
    )


# ---------------------------------------------------------------------------
# anomaly_mad
# ---------------------------------------------------------------------------


@query(
    "anomaly_mad",
    oracle="""
WITH e AS (
  SELECT event_type, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
r AS (
  SELECT event_type, event_id, v_c,
         row_number() OVER (PARTITION BY event_type ORDER BY v_c, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM e
),
med AS (
  SELECT event_type, v_c AS med_c FROM r WHERE rn = (n + 1) // 2
),
dev AS (
  SELECT e.event_type, e.event_id, ABS(e.v_c - m.med_c) AS dev_c, m.med_c
  FROM e JOIN med m ON e.event_type = m.event_type
),
dr AS (
  SELECT event_type, event_id, dev_c, med_c,
         row_number() OVER (PARTITION BY event_type ORDER BY dev_c, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
),
mad AS (
  SELECT event_type, med_c, dev_c AS mad_c FROM dr WHERE rn = (n + 1) // 2
)
SELECT d.event_type,
       COUNT(*) AS n,
       (MIN(m.med_c) / 100.0) AS median_value,
       (MIN(m.mad_c) / 100.0) AS mad_value,
       CAST(SUM(CASE WHEN d.dev_c > 3 * m.mad_c THEN 1 ELSE 0 END) AS BIGINT)
         AS n_outliers
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type
""",
)
def anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly summary per event type via Median Absolute Deviation:
    median, MAD, and how many events deviate >3 MADs — the outlier rule that
    (unlike quality.anomaly_zscore) is itself immune to the outliers it
    hunts. Medians are EXACT lower-medians selected by row_number over
    (scaled value, event_id) — a total order, so duplicates and engine sort
    instability can't change the pick. Everything rides ONE event_type
    exchange (guide §2.4): the per-type median and MAD are lifted back onto
    every row as unbounded window maxima of the single row_number-selected
    value — the same partitioning the rank windows already established — so
    the r9 shape's two broadcast-joins-back (each forcing a fresh scan of
    events and a re-exchange of the stream) collapse into window
    expressions, and the final per-type fold reuses the partitioning too
    (plan: 3 exchanges + 3 scans → 1 + 1; the two rank sorts remain — they
    are the exact-median cost). The 100 TB tier is implemented as
    mad_summary_approx below (percentile_approx, no window sorts); this
    exact path is the verification tier."""
    e = table(spark, sf_dir, "events").select(
        "event_type", "event_id", scaled_long(F.col("value"), 100).alias("v_c")
    )
    wt = Window.partitionBy("event_type")
    is_med = F.col("rn") == F.expr("(n + 1) div 2")
    dev = (
        e.select(
            "event_type",
            "event_id",
            "v_c",
            F.row_number().over(wt.orderBy("v_c", "event_id")).alias("rn"),
            F.count(F.lit(1)).over(wt).alias("n"),
        )
        .withColumn("med_c", F.max(F.when(is_med, F.col("v_c"))).over(wt))
        .select(
            "event_type",
            "event_id",
            F.abs(F.col("v_c") - F.col("med_c")).alias("dev_c"),
            "med_c",
        )
    )
    dr = dev.select(
        "event_type",
        "dev_c",
        "med_c",
        F.row_number().over(wt.orderBy("dev_c", "event_id")).alias("rn"),
        F.count(F.lit(1)).over(wt).alias("n"),
    ).withColumn("mad_c", F.max(F.when(is_med, F.col("dev_c"))).over(wt))
    return dr.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        (F.min("med_c") / F.lit(100.0)).alias("median_value"),
        (F.min("mad_c") / F.lit(100.0)).alias("mad_value"),
        F.sum(
            F.when(F.col("dev_c") > 3 * F.col("mad_c"), 1).otherwise(0)
        ).alias("n_outliers"),
    )


# ---------------------------------------------------------------------------
# agg_weighted_median
# ---------------------------------------------------------------------------


@query(
    "agg_weighted_median",
    oracle=f"""
WITH li AS (
  SELECT l_returnflag,
         {sql_scaled_long('l_extendedprice', 100)} AS price_c,
         {sql_scaled_long('l_quantity', 100)} AS w_c,
         l_orderkey, l_linenumber
  FROM lineitem
),
c AS (
  SELECT l_returnflag, price_c, w_c,
         SUM(w_c) OVER (PARTITION BY l_returnflag
                        ORDER BY price_c, l_orderkey, l_linenumber
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
         SUM(w_c) OVER (PARTITION BY l_returnflag) AS tot_w
  FROM li
)
SELECT l_returnflag,
       (MIN(CASE WHEN 2 * cum_w >= tot_w THEN price_c END) / 100.0)
         AS weighted_median_price,
       (MIN(tot_w) / 100.0) AS total_weight
FROM c
GROUP BY l_returnflag
""",
)
def agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median extended price per return flag: sort each
    group by exact cent price (ties broken by the key), accumulate exact
    integer weights, and take the first price where cumulative weight
    reaches half the total — the textbook weighted lower-median, fully
    deterministic because every comparison is integer. One partitioned
    window pass (shuffle keyed by returnflag) + an aggregation that reuses
    the same partitioning. The all-integer cumulative sum is also the
    100 TB answer: double weights would drift ulp-by-ulp along a billion-row
    running sum and flip the ≥ half-total test near the boundary."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        scaled_long(F.col("l_extendedprice"), 100).alias("price_c"),
        scaled_long(F.col("l_quantity"), 100).alias("w_c"),
        "l_orderkey",
        "l_linenumber",
    )
    wf = Window.partitionBy("l_returnflag")
    run = wf.orderBy("price_c", "l_orderkey", "l_linenumber").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = li.select(
        "l_returnflag",
        "price_c",
        F.sum("w_c").over(run).alias("cum_w"),
        F.sum("w_c").over(wf).alias("tot_w"),
    )
    return c.groupBy("l_returnflag").agg(
        (
            F.min(F.when(2 * F.col("cum_w") >= F.col("tot_w"), F.col("price_c")))
            / F.lit(100.0)
        ).alias("weighted_median_price"),
        (F.min("tot_w") / F.lit(100.0)).alias("total_weight"),
    )


# ---------------------------------------------------------------------------
# event_path_topk
# ---------------------------------------------------------------------------


@query(
    "event_path_topk",
    oracle="""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us, event_id
  FROM events
),
p AS (
  SELECT user_id,
         lag(event_type, 2) OVER w AS e1,
         lag(event_type, 1) OVER w AS e2,
         event_type AS e3
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
)
SELECT (e1 || '>' || e2 || '>' || e3) AS path, COUNT(*) AS n_occurrences
FROM p
WHERE e1 IS NOT NULL
GROUP BY path
ORDER BY n_occurrences DESC, path
LIMIT 10
""",
)
def event_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 most frequent 3-step event-type paths across all user
    journeys (the path-mining primitive behind funnel discovery). Per-user
    lag window forms each consecutive triple in one keyed shuffle; the
    global count is a map-side-combinable aggregation on the tiny path
    domain (≤5³ distinct paths); the final top-10 is ORDER BY + LIMIT, which
    Spark plans as TakeOrderedAndProject — per-partition bounded heaps, no
    global sort, no single-task bottleneck at any corpus size. Ties break
    lexicographically so the cut is deterministic."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_type", epoch_us("ts").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    p = e.select(
        F.lag("event_type", 2).over(w).alias("e1"),
        F.lag("event_type", 1).over(w).alias("e2"),
        F.col("event_type").alias("e3"),
    ).filter(F.col("e1").isNotNull())
    paths = p.select(
        F.concat_ws(">", "e1", "e2", "e3").alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# zorder_cluster_audit
# ---------------------------------------------------------------------------

_Z_BITS = 16


def _sql_morton(x: str, y: str) -> str:
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


@query(
    "zorder_cluster_audit",
    oracle=f"""
WITH raw AS (
  SELECT o_custkey AS xr,
         (epoch_us(o_orderdate) // 86400000000) AS yr
  FROM orders
),
stats AS (
  SELECT MIN(xr) AS minx, MAX(xr) AS maxx, MIN(yr) AS miny, MAX(yr) AS maxy
  FROM raw
),
o AS (
  SELECT ((xr - minx) * 65535) // GREATEST(maxx - minx, 1) AS x,
         ((yr - miny) * 65535) // GREATEST(maxy - miny, 1) AS y
  FROM raw CROSS JOIN stats
),
z AS (
  SELECT x, y, ({_sql_morton('x', 'y')}) AS zcode
  FROM o
)
SELECT (zcode >> {2 * _Z_BITS - 4}) AS z_bucket,
       COUNT(*) AS n_rows,
       MIN(x) AS min_x, MAX(x) AS max_x,
       MIN(y) AS min_y, MAX(y) AS max_y
FROM z
GROUP BY z_bucket
""",
)
def zorder_cluster_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering audit over orders: normalize customer key
    and order day onto a 2^16 fixed-point grid (exact integer arithmetic
    against broadcast 1-row min/max stats — the standard Z-order recipe, so
    every dimension's full range reaches the interleave), interleave the
    bits into one space-filling-curve code, bucket rows by the code's top 4
    bits, and report each bucket's per-dimension min/max envelope — the
    file-layout audit you run before `repartitionByRange(zcode).write` to
    prove that BOTH custkey and date predicates will prune files
    (README.md:8 partitioning/cluster tuning). The Morton code is a pure
    bitwise projection (whole-stage codegen, no UDF) and the bucket comes
    from its fixed bit PREFIX, so the audit is one keyed aggregation — no
    global sort; at 100 TB the same projection feeds the range-partitioned
    writer implemented as write_zordered below, and the stats pass is the cheap
    column-statistics scan every writer already does."""
    raw = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("xr"),
        F.floor(epoch_us("o_orderdate") / F.lit(86_400_000_000)).alias("yr"),
    )
    stats = raw.agg(
        F.min("xr").alias("minx"),
        F.max("xr").alias("maxx"),
        F.min("yr").alias("miny"),
        F.max("yr").alias("maxy"),
    )
    joined = raw.crossJoin(F.broadcast(stats))

    def norm(v: str, lo: str, hi: str) -> Column:
        # exact integer division (`div`), NOT `/`: double division could
        # round a just-below-integer quotient up and disagree with the
        # oracle's integer `//` at grid-cell boundaries.
        return F.expr(f"(({v} - {lo}) * 65535L) div greatest({hi} - {lo}, 1L)")

    o = joined.select(
        norm("xr", "minx", "maxx").alias("x"),
        norm("yr", "miny", "maxy").alias("y"),
    )
    zdf = o.select("x", "y", morton_code(F.col("x"), F.col("y")).alias("zcode"))
    return zdf.groupBy(
        F.shiftright(F.col("zcode"), 2 * _Z_BITS - 4).alias("z_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
    )


# ---------------------------------------------------------------------------
# rfm_segmentation
# ---------------------------------------------------------------------------

_RFM_ASOF_US = 1_009_843_200_000_000  # naive epoch µs of 2002-01-01 00:00:00


@query(
    "rfm_segmentation",
    oracle=f"""
WITH o AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) AS us,
         {sql_scaled_long('o_totalprice', 100)} AS price_c
  FROM orders
),
u AS (
  -- GREATEST(…, 0): clamp post-as-of orders to recency 0. Also keeps the
  -- division domain nonnegative, where DuckDB's truncating // and
  -- Spark's flooring division agree.
  SELECT o.o_custkey AS custkey, c.c_mktsegment AS segment,
         GREATEST({_RFM_ASOF_US} - MAX(o.us), 0) // 86400000000 AS r_days,
         COUNT(*) AS f_orders,
         (SUM(o.price_c) / 100.0) AS m_total
  FROM o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
s AS (
  SELECT custkey, segment, r_days, f_orders, m_total,
         COUNT(*) OVER (PARTITION BY segment) AS n,
         row_number() OVER (PARTITION BY segment
                            ORDER BY r_days ASC, custkey) AS r_rank,
         row_number() OVER (PARTITION BY segment
                            ORDER BY f_orders DESC, custkey) AS f_rank,
         row_number() OVER (PARTITION BY segment
                            ORDER BY m_total DESC, custkey) AS m_rank
  FROM u
)
SELECT custkey, segment, r_days, f_orders, m_total,
       CAST(5 - ((r_rank - 1) * 5) // n AS BIGINT) AS r_score,
       CAST(5 - ((f_rank - 1) * 5) // n AS BIGINT) AS f_score,
       CAST(5 - ((m_rank - 1) * 5) // n AS BIGINT) AS m_score
FROM s
""",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary) scored
    WITHIN each market segment — the standard practice that also keeps
    every window partitioned by a real key (no global sort). Raw metrics
    come from one orders aggregation keyed by custkey; quintile scores are
    rank-based (1 + floor((rank−1)·5/n) flipped so 5 = best), which is pure
    integer arithmetic over a total order — deterministic in both engines,
    unlike percentile-interpolation cutoffs. Recency is measured against a
    fixed as-of date (a run parameter in production — avoids a global
    max-date pass). At 100 TB the orders agg is the only big shuffle; the
    per-segment score windows run over the already-aggregated customer
    dimension, and the scale swap -- implemented as rfm_score_by_cutoffs below --
    scores against broadcast quantile cutoffs as a pure map."""
    u = rfm_user_metrics(spark, sf_dir)
    wseg = Window.partitionBy("segment")
    s = u.select(
        "custkey",
        "segment",
        "r_days",
        "f_orders",
        "m_total",
        F.count(F.lit(1)).over(wseg).alias("n"),
        F.row_number().over(wseg.orderBy(F.asc("r_days"), "custkey")).alias("r_rank"),
        F.row_number().over(wseg.orderBy(F.desc("f_orders"), "custkey")).alias("f_rank"),
        F.row_number()
        .over(wseg.orderBy(F.desc("m_total"), "custkey"))
        .alias("m_rank"),
    )

    def score(rank: str) -> Column:
        # integer `div`, not double `/`+floor: bit-exact at any n (the
        # double path can mis-floor near representability boundaries)
        return (F.lit(5) - F.expr(f"(({rank} - 1) * 5) div n")).cast("long")

    return s.select(
        "custkey",
        "segment",
        "r_days",
        "f_orders",
        "m_total",
        score("r_rank").alias("r_score"),
        score("f_rank").alias("f_score"),
        score("m_rank").alias("m_score"),
    )


# ---------------------------------------------------------------------------
# time_weighted_avg
# ---------------------------------------------------------------------------


@query(
    "time_weighted_avg",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
seg AS (
  SELECT user_id, v_c, us,
         lead(v_c) OVER w AS next_v,
         lead(us)  OVER w AS next_us
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
),
a AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         MAX(us) - MIN(us) AS span_us,
         SUM(CASE WHEN next_us IS NOT NULL
                  THEN CAST(v_c + next_v AS HUGEINT) * (next_us - us)
                  ELSE CAST(0 AS HUGEINT) END) AS wsum,
         SUM(v_c) AS plain_sum
  FROM seg
  GROUP BY user_id
)
SELECT user_id, n_events,
       CASE WHEN span_us = 0
            THEN (plain_sum / (100.0 * n_events))
            -- int128 -> double via VARCHAR (see agg_corr_matrix)
            ELSE CAST(CAST(wsum AS VARCHAR) AS DOUBLE)
                 / (2.0 * 100.0 * span_us)
       END AS twa_value
FROM a
""",
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average of each user's value series — the hypertable
    aggregate that answers "what was the average LEVEL over the window",
    not "the average of the samples" (irregular sampling biases plain AVG
    toward busy periods). Trapezoidal rule in exact integers: each
    consecutive pair contributes (vᵢ+vᵢ₊₁)·Δt, accumulated in
    decimal(38,0)/int128 (cents × microsecond gaps × many rows overflows
    int64), divided once by 2·span. Degenerate single-instant series fall
    back to the plain exact mean. One lead-window pass and the rollup both
    key on user_id — a single shuffle of the event log, same as
    sessionize_batch."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("us"),
        scaled_long(F.col("value"), 100).alias("v_c"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    seg = e.select(
        "user_id",
        "v_c",
        "us",
        F.lead("v_c").over(w).alias("next_v"),
        F.lead("us").over(w).alias("next_us"),
    )
    dec = "decimal(38,0)"
    contrib = F.when(
        F.col("next_us").isNotNull(),
        ((F.col("v_c") + F.col("next_v")).cast(dec) * (F.col("next_us") - F.col("us"))).cast(dec),
    ).otherwise(F.lit(0).cast(dec))
    a = seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.max("us") - F.min("us")).alias("span_us"),
        F.sum(contrib).alias("wsum"),
        F.sum("v_c").alias("plain_sum"),
    )
    return a.select(
        "user_id",
        "n_events",
        F.when(
            F.col("span_us") == 0,
            F.col("plain_sum") / (F.lit(100.0) * F.col("n_events")),
        )
        .otherwise(
            F.col("wsum").cast("double")
            / (F.lit(2.0) * F.lit(100.0) * F.col("span_us"))
        )
        .alias("twa_value"),
    )


# ---------------------------------------------------------------------------
# win_rolling_median
# ---------------------------------------------------------------------------


@query(
    "win_rolling_median",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
r AS (
  SELECT user_id, event_id, us, v_c,
         list(v_c) OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS lst
  FROM e
)
SELECT user_id, event_id, us,
       (list_sort(lst)[CAST((len(lst) + 1) // 2 AS INT)] / 100.0)
         AS rolling_median
FROM r
""",
)
def win_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median (lower-median of the last 7 observations) per
    user — the robust smoother for spiky series where a moving average
    chases outliers (win_moving_avg's complement). The frame is collected,
    sorted, and indexed — O(k log k) per row with k=7 bounded, so the
    window never holds unbounded state; all comparisons are on exact
    integer cents, making the pick deterministic under duplicates in both
    engines. One keyed window shuffle on user_id."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("us"),
        scaled_long(F.col("value"), 100).alias("v_c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-6, Window.currentRow)
    )
    lst = F.collect_list("v_c").over(w)
    med = F.element_at(
        F.array_sort(lst), F.shiftright(F.size(lst) + F.lit(1), 1)
    )
    return e.select(
        "user_id", "event_id", "us", (med / F.lit(100.0)).alias("rolling_median")
    )


# ---------------------------------------------------------------------------
# dq_freshness_lag
# ---------------------------------------------------------------------------

_FRESH_ASOF_US = 1_706_659_200_000_000  # naive epoch µs of 2024-01-31 00:00:00
_FRESH_SLA_US = 86_400_000_000  # 1 day


@query(
    "dq_freshness_lag",
    oracle=f"""
SELECT event_type,
       COUNT(*) AS n_events,
       MAX(epoch_us(ts)) AS max_us,
       {_FRESH_ASOF_US} - MAX(epoch_us(ts)) AS lag_us,
       ({_FRESH_ASOF_US} - MAX(epoch_us(ts))) > {_FRESH_SLA_US} AS stale
FROM events
GROUP BY event_type
""",
)
def dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-freshness monitor: per feed (event_type), the lag between the
    newest event and the pipeline's as-of instant, flagged against a 1-day
    SLA — the standard post-load integrity check (reference README.md:12)
    that catches a silently-stalled upstream BEFORE consumers read stale
    data. One map-side-combinable aggregation over the log: MAX pushes
    partial per partition, so the check costs one tiny shuffle at any
    scale and composes with incr_load_watermark's high-watermark (this is
    its monitoring face)."""
    asof = F.lit(_FRESH_ASOF_US)
    return (
        table(spark, sf_dir, "events")
        .select("event_type", epoch_us("ts").alias("us"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max("us").alias("max_us"),
            (asof - F.max("us")).alias("lag_us"),
            ((asof - F.max("us")) > F.lit(_FRESH_SLA_US)).alias("stale"),
        )
    )


# ---------------------------------------------------------------------------
# win_cusum_drift
# ---------------------------------------------------------------------------

_CUSUM_K_C = 2500   # reference drift allowance, cents (k)
_CUSUM_H_C = 20000  # alarm threshold, cents (h)


@query(
    "win_cusum_drift",
    oracle=f"""
WITH e AS (
  SELECT event_type, event_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
m AS (
  SELECT event_type,
         CAST((SUM(v_c) - SUM(v_c) % COUNT(*)) / COUNT(*) AS BIGINT) AS mean_c
  FROM e GROUP BY event_type
),
p AS (
  SELECT e.event_type, e.event_id, e.us,
         SUM(e.v_c - m.mean_c - {_CUSUM_K_C}) OVER w AS pref
  FROM e JOIN m ON e.event_type = m.event_type
  WINDOW w AS (PARTITION BY e.event_type ORDER BY e.us, e.event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
s AS (
  -- LEAST(min, 0): the running min includes the virtual empty prefix P0=0
  SELECT event_type, event_id, us,
         CAST(pref - LEAST(MIN(pref) OVER w2, 0) AS BIGINT) AS cusum_c
  FROM p
  WINDOW w2 AS (PARTITION BY event_type ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, event_id, us,
       (cusum_c / 100.0) AS cusum,
       cusum_c > {_CUSUM_H_C} AS alarm
FROM s
""",
)
def win_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift detection per event type: the control-chart
    statistic Sᵢ = max(0, Sᵢ₋₁ + xᵢ − μ − k), alarmed when S > h.
    The recursion LOOKS sequential, but the classic identity
    S = P − running-min(P) over the prefix sums P of (x − μ − k) turns it
    into window passes — no iterative loop, no UDF with state — and the
    kernel further decomposes the scan into per-(type, day) segments with
    a tiny carry relation (cusum_stat), so parallelism scales with the
    log's time span instead of capping at the handful of event types: the
    pre-segmented plan ran its big window 5-wide forever at 100× rows
    (BENCH_SCALING sf10 r9: ratio 11.75×). μ is the per-type integer
    floor-mean (exact in both engines); all accumulation is integer cents,
    so the max-reset boundary can't flip from float drift after a billion
    rows."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        epoch_us("ts").alias("us"),
        scaled_long(F.col("value"), 100).alias("v_c"),
    )
    # exact integer floor-mean: (sum - sum % n) / n == sum div n for sum>=0
    m = e.groupBy("event_type").agg(
        ((F.sum("v_c") - F.sum("v_c") % F.count(F.lit(1))) / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_c")
    )
    return cusum_stat(e, m)


def cusum_stat(
    e: DataFrame,
    targets: DataFrame,
    k_c: int = _CUSUM_K_C,
    h_c: int = _CUSUM_H_C,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """The CUSUM kernel on (event_type, event_id, us, v_c) against a tiny
    (event_type, mean_c) calibration relation — separated from the fixture
    scan so property-based tests can model-check the window identity
    against the sequential recursion on generated series
    (tests/test_analytics_ops.py), and so the streaming face
    (streaming/windows.py stateful_cusum) shares its parameters.

    Segmented-scan formulation: a window PARTITION BY event_type caps
    parallelism at the number of types (5 in the fixture — and at 100 TB a
    single task would own a type's entire history), so the prefix scan is
    decomposed over (event_type, day-of-us) segments, the textbook
    parallel-prefix shape:

      per segment (parallel, one shuffle on the 2-part key):
        lp  = local prefix sum of d = v_c − μ − k, lmin = running min(lp)
      per-segment carry (|types| × |days| rows, tiny):
        c_in = exclusive prefix sum of segment totals
        m_in = least(0, min over prior segments of (c_in + segment min))
      recombine (broadcast the carry back):
        P_i  = c_in + lp_i,   runmin_i = least(m_in, c_in + lmin_i)
        S_i  = P_i − runmin_i          (m_in carries the virtual P₀ = 0)

    Everything is integer cents, so the segmented recombination is
    bit-identical to the flat scan (hypothesis model-checks both the
    single-segment and forced-multi-segment paths)."""
    base = e.join(F.broadcast(targets), "event_type").select(
        "event_type",
        "event_id",
        "us",
        # coalesce makes bkt NON-NULLABLE, which matters twice: (a) a null
        # ts lands in bucket −1 (sorts before every real bucket, exactly
        # where NULLS FIRST put it in the flat scan), and (b) no
        # isnotnull(bkt) filter gets inferred into just ONE branch's scan,
        # so the two lineages below stay plan-identical up to the big
        # exchange and ReuseExchange shares the shuffle instead of
        # re-scanning and re-shuffling the log for the carry side
        F.coalesce(
            F.col("us") - F.col("us") % F.lit(bucket_us), F.lit(-1)
        ).alias("bkt"),
        (F.col("v_c") - F.col("mean_c") - F.lit(k_c)).alias("d"),
    )
    seg = Window.partitionBy("event_type", "bkt").orderBy(
        "us", "event_id"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    loc = base.select(
        "event_type",
        "event_id",
        "us",
        "bkt",
        "d",
        F.sum("d").over(seg).alias("lp"),
    ).withColumn("lmin", F.min("lp").over(seg))
    # segment totals/minima: the groupBy keys equal the window partitioning,
    # so this aggregate re-uses the existing distribution (no new exchange)
    chunks = loc.groupBy("event_type", "bkt").agg(
        F.sum("d").alias("csum"), F.min("lp").alias("cmin")
    )
    prior = Window.partitionBy("event_type").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = chunks.select(
        "event_type",
        "bkt",
        F.coalesce(F.sum("csum").over(prior), F.lit(0)).alias("c_in"),
        "cmin",
    ).select(
        "event_type",
        "bkt",
        "c_in",
        # least() skips nulls, so an empty prior frame leaves the virtual
        # empty prefix P₀ = 0 — the same 0-floor the flat identity needs:
        # without it a series starting above target would report S = 0
        # where the recursion says S = P₁ (caught by the model check)
        F.least(
            F.lit(0), F.min(F.col("c_in") + F.col("cmin")).over(prior)
        ).alias("m_in"),
    )
    out = loc.join(F.broadcast(carry), ["event_type", "bkt"]).select(
        "event_type",
        "event_id",
        "us",
        (
            (F.col("c_in") + F.col("lp"))
            - F.least(F.col("m_in"), F.col("c_in") + F.col("lmin"))
        )
        .cast("long")
        .alias("cusum_c"),
    )
    return out.select(
        "event_type",
        "event_id",
        "us",
        (F.col("cusum_c") / F.lit(100.0)).alias("cusum"),
        (F.col("cusum_c") > F.lit(h_c)).alias("alarm"),
    )


# ---------------------------------------------------------------------------
# win_bollinger_bands
# ---------------------------------------------------------------------------


@query(
    "win_bollinger_bands",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
r AS (
  SELECT user_id, event_id, us, v_c,
         COUNT(*) OVER w AS n,
         SUM(v_c) OVER w AS s,
         SUM(CAST(v_c AS HUGEINT) * v_c) OVER w AS ss
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)
)
SELECT user_id, event_id, us,
       (v_c / 100.0) AS value,
       (s / (100.0 * n)) AS sma,
       CASE WHEN n > 1 THEN
         (s / (100.0 * n))
           + 2.0 * sqrt((n * CAST(CAST(ss AS VARCHAR) AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (1.0 * n * n * (n - 1))) / 100.0
       END AS upper_band,
       CASE WHEN n > 1 THEN
         (s / (100.0 * n))
           - 2.0 * sqrt((n * CAST(CAST(ss AS VARCHAR) AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                        / (1.0 * n * n * (n - 1))) / 100.0
       END AS lower_band
FROM r
""",
)
def win_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands per user: 10-observation simple moving average ± 2
    rolling sample standard deviations. The rolling variance comes from
    exact integer frame sums (Σx, Σx² — squares in int128/decimal38 with
    the VARCHAR-hop double conversion, see agg_corr_matrix), finished by
    ONE identical float expression in both engines — so even the sqrt is
    bit-stable. Contrast with F.stddev over the frame: per-frame float
    accumulation whose order differs between engines and across retries.
    One keyed window shuffle; bounded frame ⇒ O(1) state per row."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("us"),
        scaled_long(F.col("value"), 100).alias("v_c"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    dec = "decimal(38,0)"
    r = e.select(
        "user_id",
        "event_id",
        "us",
        "v_c",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("v_c").over(w).alias("s"),
        F.sum((F.col("v_c").cast(dec) * F.col("v_c")).cast(dec)).over(w).alias("ss"),
    )
    n = F.col("n")
    s = F.col("s")
    sma = s / (F.lit(100.0) * n)
    sd = F.sqrt(
        (n * F.col("ss").cast("double") - s.cast("double") * s.cast("double"))
        / (F.lit(1.0) * n * n * (n - 1))
    )
    band = F.lit(2.0) * sd / F.lit(100.0)
    return r.select(
        "user_id",
        "event_id",
        "us",
        (F.col("v_c") / F.lit(100.0)).alias("value"),
        sma.alias("sma"),
        F.when(n > 1, sma + band).alias("upper_band"),
        F.when(n > 1, sma - band).alias("lower_band"),
    )


# ---------------------------------------------------------------------------
# win_drawdown
# ---------------------------------------------------------------------------


@query(
    "win_drawdown",
    oracle="""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
c AS (
  SELECT user_id, event_id, us,
         SUM(v_c) OVER w AS equity_c
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
d AS (
  SELECT user_id, event_id, us, equity_c,
         MAX(equity_c) OVER w2 AS peak_c
  FROM c
  WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT user_id,
       (MAX(peak_c - equity_c) / 100.0) AS max_drawdown,
       (MAX(equity_c) / 100.0) AS peak_equity,
       COUNT(*) AS n_events
FROM d
GROUP BY user_id
""",
)
def win_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown per user over the cumulative value series
    (peak-to-trough loss of the running total — the risk statistic for any
    accumulating quantity: revenue, balance, token budget). Running sum →
    running max → max gap: three compositions of the SAME keyed window, so
    Spark plans one shuffle + one per-partition sort serving both window
    passes and the final rollup reuses the partitioning. Exact integer
    cents throughout — a running sum of doubles would accumulate ulp drift
    exactly where the peak comparison decides."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("us"),
        scaled_long(F.col("value"), 100).alias("v_c"),
    )
    run = Window.partitionBy("user_id").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    c = e.select(
        "user_id", "event_id", "us", F.sum("v_c").over(run).alias("equity_c")
    )
    d = c.select(
        "user_id",
        "equity_c",
        F.max("equity_c").over(run).alias("peak_c"),
    )
    return d.groupBy("user_id").agg(
        (F.max(F.col("peak_c") - F.col("equity_c")) / F.lit(100.0)).alias(
            "max_drawdown"
        ),
        (F.max("equity_c") / F.lit(100.0)).alias("peak_equity"),
        F.count(F.lit(1)).alias("n_events"),
    )


# ---------------------------------------------------------------------------
# seasonality_weekday_profile
# ---------------------------------------------------------------------------


@query(
    "seasonality_weekday_profile",
    oracle="""
WITH e AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 86400000000 + 4) % 7 AS BIGINT) AS weekday,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
wd AS (
  SELECT event_type, weekday, COUNT(*) AS n, SUM(v_c) AS s
  FROM e GROUP BY event_type, weekday
),
tot AS (
  SELECT event_type, SUM(n) AS tn, SUM(s) AS ts
  FROM wd GROUP BY event_type
)
SELECT w.event_type, w.weekday, w.n AS n_events,
       (w.s / (100.0 * w.n)) AS weekday_avg,
       ((w.s / (100.0 * w.n)) - (t.ts / (100.0 * t.tn))) AS deviation_from_mean
FROM wd w JOIN tot t ON w.event_type = t.event_type
""",
)
def seasonality_weekday_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality profile per event type: average value per
    weekday and its deviation from the type's overall mean — the decompose
    step before any seasonal adjustment. Weekday comes from integer
    floor-division of epoch microseconds (epoch day 0 = Thursday, hence
    the +4 shift; no timezone/calendar library in the hot path, identical
    in both engines). Two aggregations over the tiny (type × 7) domain,
    both map-side combinable; the second reuses the first's output, so the
    event log is scanned once and shuffled once at any scale."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        ((F.floor(epoch_us("ts") / F.lit(86_400_000_000)) + 4) % 7)
        .cast("long")
        .alias("weekday"),
        scaled_long(F.col("value"), 100).alias("v_c"),
    )
    wd = e.groupBy("event_type", "weekday").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v_c").alias("s")
    )
    tot = wd.groupBy("event_type").agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts")
    )
    avg_wd = F.col("s") / (F.lit(100.0) * F.col("n"))
    avg_all = F.col("ts") / (F.lit(100.0) * F.col("tn"))
    return (
        wd.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "weekday",
            F.col("n").alias("n_events"),
            avg_wd.alias("weekday_avg"),
            (avg_wd - avg_all).alias("deviation_from_mean"),
        )
    )


# ---------------------------------------------------------------------------
# market_basket_pairs
# ---------------------------------------------------------------------------


@query(
    "market_basket_pairs",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
freq AS (SELECT l_partkey, COUNT(*) AS c FROM items GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS pk1, b.l_partkey AS pk2, COUNT(*) AS c_ab
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT p.pk1, p.pk2, p.c_ab,
       (p.c_ab / (1.0 * n.n_orders)) AS support,
       (p.c_ab / (1.0 * fa.c)) AS confidence,
       ((p.c_ab * n.n_orders) / (1.0 * fa.c * fb.c)) AS lift
FROM pairs p
JOIN freq fa ON p.pk1 = fa.l_partkey
JOIN freq fb ON p.pk2 = fb.l_partkey
CROSS JOIN n
WHERE p.c_ab >= 2
""",
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: support,
    confidence, and lift for every part pair co-ordered at least twice —
    the Apriori first rung, the recommender/affinity primitive.

    Pair generation is BASKET-LOCAL: one groupBy(orderkey) folds each
    basket into a sorted distinct item array (the partial collect_set
    absorbs the per-order dedup map-side), and the C(|basket|,2) pair
    fan-out — bounded by basket size, never corpus² — happens as a JVM
    higher-order transform over that array, so there is NO self-join and
    NO sort-merge sort buffers. Frequencies and the basket count derive
    from the SAME baskets relation (exchange reuse, one big shuffle
    total). The earlier self-join formulation computed the distinct-items
    subtree twice and sorted both join sides: sf10 per-stage telemetry
    attributed ~60% of its 5.5 GB disk spill to exactly that duplicated
    distinct + SMJ sort (tools/bench_basket.py records the A/B).
    The Apriori min-support prune survives as two broadcast semi-joins on
    the generated pair stream (map-side, before the pair shuffle) — a
    pair with c_ab >= 2 needs both parts in >= 2 baskets, so the prune is
    provably result-preserving and keeps the shuffled pair space
    proportional to the frequent items, not the catalog. All ratios are
    single identical double expressions over exact integer counts —
    bit-stable."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    # basket arrays via ONE order-keyed aggregation (the partial
    # collect_set absorbs per-order dedup map-side); the repartition is a
    # stage barrier, not a co-location need — it pins the object-format
    # collect_set finalization BELOW a materialized exchange, so (a) the
    # pair-fan-out stage never stacks heap on top of it, and (b) every
    # broadcast-subquery job (freq, n) REUSES that one exchange instead of
    # re-running the collect_set reduce (concurrent object-agg stages are
    # what pressured a tight 32-thread heap; one spills fine)
    baskets = (
        li.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
        .repartition("l_orderkey")
    )
    # frequencies and the 1-row basket count ride the reused baskets
    # exchange: explode is map-side, the per-part count state is bounded
    # by the catalog — no second scan, no separate distinct pipeline
    n = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    freq = (
        baskets.select(F.explode("ps").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # all (i < j) pairs of the sorted basket array, generated in the JVM —
    # C(|basket|,2) fan-out, bounded by basket size, never corpus²; no
    # self-join, no sort-merge sort buffers (the earlier self-join
    # formulation computed the distinct-items subtree twice and sorted
    # both sides: sf10 per-stage telemetry attributed most of its 5.5 GB
    # disk spill there — tools/bench_basket.py records the A/B)
    pair_arr = F.flatten(
        F.transform(
            "ps",
            lambda x, i: F.transform(
                F.slice(F.col("ps"), i + F.lit(2), F.size("ps")),
                lambda y: F.struct(x.alias("pk1"), y.alias("pk2")),
            ),
        )
    )
    frequent = freq.filter(F.col("c") >= 2).select("l_partkey")
    # Apriori min-support prune, applied map-side BEFORE the pair shuffle:
    # a pair with c_ab >= 2 needs both parts in >= 2 baskets, so the two
    # broadcast semi-joins are provably result-preserving and keep the
    # shuffled pair space proportional to the frequent items (freq rides
    # the reused post-repartition baskets exchange — see above — so the
    # broadcast-subquery jobs reuse the materialized shuffle instead of
    # re-running the object-format collect_set reduce)
    pairs = (
        baskets.select(F.explode(pair_arr).alias("p"))
        .select(F.col("p.pk1").alias("pk1"), F.col("p.pk2").alias("pk2"))
        .join(
            F.broadcast(frequent.withColumnRenamed("l_partkey", "pk1")),
            "pk1",
            "left_semi",
        )
        .join(
            F.broadcast(frequent.withColumnRenamed("l_partkey", "pk2")),
            "pk2",
            "left_semi",
        )
        # pre-partitioning on the group keys makes Catalyst plan ONE
        # complete aggregate instead of partial+final: co-ordered pairs
        # are mostly unique, so a map-side partial combine buys ~nothing
        # while its hash state dominated this stage's spill — streaming
        # the raw pair rows to the exchange is strictly cheaper here.
        # Width is 2x the session grain because this exchange carries the
        # FAN-OUT volume (Σ C(|basket|,2) ≈ 2-3x the input rows) and the
        # complete aggregate's state is sized by pairs/partition — at the
        # sf10 policy grain the 2x is the measured spill-free point
        # (BENCH_BASKET.json: 64 -> 2.7 GB agg spill, 128 -> none)
        .repartition(
            2 * int(spark.conf.get("spark.sql.shuffle.partitions")),
            "pk1",
            "pk2",
        )
        .groupBy("pk1", "pk2")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= 2)
    )
    fa = freq.select(F.col("l_partkey").alias("pk1"), F.col("c").alias("ca"))
    fb = freq.select(F.col("l_partkey").alias("pk2"), F.col("c").alias("cb"))
    out = (
        pairs.join(F.broadcast(fa), "pk1")
        .join(F.broadcast(fb), "pk2")
        .crossJoin(F.broadcast(n))
        .select(
            "pk1",
            "pk2",
            "c_ab",
            (F.col("c_ab") / (F.lit(1.0) * F.col("n_orders"))).alias("support"),
            (F.col("c_ab") / (F.lit(1.0) * F.col("ca"))).alias("confidence"),
            (
                (F.col("c_ab") * F.col("n_orders"))
                / (F.lit(1.0) * F.col("ca") * F.col("cb"))
            ).alias("lift"),
        )
    )
    return out


# ---------------------------------------------------------------------------
# resample_interpolate_linear
# ---------------------------------------------------------------------------

_GRID_START_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00
_GRID_END_US = 1_706_572_800_000_000    # 2024-01-30 00:00:00
_GRID_STEP_US = 21_600_000_000          # 6 hours


@query(
    "resample_interpolate_linear",
    oracle=f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, 0 AS kind, event_id,
         CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v_c
  FROM events
),
grid AS (
  SELECT u.user_id, g.us, 1 AS kind, CAST(-1 AS BIGINT) AS event_id,
         CAST(NULL AS BIGINT) AS v_c
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (
    SELECT unnest(range({_GRID_START_US}, {_GRID_END_US} + 1,
                        {_GRID_STEP_US})) AS us) g
),
m AS (
  SELECT user_id, us, kind,
         last_value(CASE WHEN kind = 0 THEN us END IGNORE NULLS) OVER wp AS prev_us,
         last_value(CASE WHEN kind = 0 THEN v_c END IGNORE NULLS) OVER wp AS prev_v,
         first_value(CASE WHEN kind = 0 THEN us END IGNORE NULLS) OVER wn AS next_us,
         first_value(CASE WHEN kind = 0 THEN v_c END IGNORE NULLS) OVER wn AS next_v
  FROM (SELECT user_id, us, kind, event_id, v_c FROM e
        UNION ALL SELECT user_id, us, kind, event_id, v_c FROM grid)
  WINDOW wp AS (PARTITION BY user_id ORDER BY us, kind, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wn AS (PARTITION BY user_id ORDER BY us, kind, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, us AS grid_us,
       -- exact integer lerp numerator, ONE double division at the end:
       -- a float a+b*c lerp is vulnerable to compiler FMA contraction
       -- (differs between engines in the last ulp); the rational form has
       -- a single rounding point. int128 -> double via VARCHAR (see
       -- agg_corr_matrix).
       CASE
         WHEN prev_us IS NULL OR next_us IS NULL THEN NULL
         ELSE CAST(CAST(CAST(prev_v AS HUGEINT) * (next_us - us)
                        + CAST(next_v AS HUGEINT) * (us - prev_us)
                        AS VARCHAR) AS DOUBLE)
              / ((next_us - prev_us) * 100.0)
       END AS value_interp
FROM m
WHERE kind = 1
""",
)
def resample_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of each user's value series onto a regular 6-h
    grid — the sensor/metric resampling that win_forward_fill (LOCF) and
    resample_time_bucket (OHLC) don't cover: the reconstructed LEVEL
    between observations. NOT a range join: grid points union into the
    event log and one forward + one backward running window recover the
    bracketing observations — two keyed window passes on user_id, cost
    independent of gap sizes (the same union trick as join_asof_tolerance,
    applied in both directions). Grid instants outside the observed range
    yield NULL (no extrapolation). The interpolation weight is the single
    identical float expression over exact integer microsecond gaps and
    cents — bit-stable."""
    e = table(spark, sf_dir, "events").select(
        "user_id",
        epoch_us("ts").alias("us"),
        F.lit(0).alias("kind"),
        "event_id",
        scaled_long(F.col("value"), 100).alias("v_c"),
    )
    grid = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit(_GRID_START_US),
                    F.lit(_GRID_END_US),
                    F.lit(_GRID_STEP_US),
                )
            ).alias("us"),
            F.lit(1).alias("kind"),
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("v_c"),
        )
    )
    u = e.unionByName(grid)
    # event_id in the ordering: two events of one user at the SAME
    # microsecond would otherwise make prev/next engine-nondeterministic
    wp = (
        Window.partitionBy("user_id")
        .orderBy("us", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # next_* via a REVERSED-order RUNNING frame, not a (CURRENT ROW,
    # UNBOUNDED FOLLOWING) frame (r11): Spark's unbounded-following frame
    # re-scans from the current row to the partition end for EVERY row
    # (UnboundedFollowingWindowFunctionFrame — O(rows² per partition)),
    # while the running frame accumulates incrementally in O(rows).
    # (us, kind, event_id) is a strict total order within a user, so the
    # descending sort is its exact mirror and last(non-null) over the
    # reversed prefix IS first(non-null) over the forward suffix —
    # identical values; the price is one extra in-partition sort on the
    # same user_id exchange, no new shuffle (A/B in OPTIMIZATION_r11.md).
    wn = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("us"), F.desc("kind"), F.desc("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    obs_us = F.when(F.col("kind") == 0, F.col("us"))
    obs_v = F.when(F.col("kind") == 0, F.col("v_c"))
    m = u.select(
        "user_id",
        "us",
        "kind",
        F.last(obs_us, ignorenulls=True).over(wp).alias("prev_us"),
        F.last(obs_v, ignorenulls=True).over(wp).alias("prev_v"),
        F.last(obs_us, ignorenulls=True).over(wn).alias("next_us"),
        F.last(obs_v, ignorenulls=True).over(wn).alias("next_v"),
    )
    # exact integer lerp numerator + ONE double division — a float a+b*c
    # lerp differs between engines in the last ulp under compiler FMA
    # contraction; the rational form has a single rounding point
    dec = "decimal(38,0)"
    num = F.col("prev_v").cast(dec) * (F.col("next_us") - F.col("us")) + F.col(
        "next_v"
    ).cast(dec) * (F.col("us") - F.col("prev_us"))
    interp = num.cast("double") / (
        (F.col("next_us") - F.col("prev_us")) * F.lit(100.0)
    )
    return m.filter(F.col("kind") == 1).select(
        "user_id",
        F.col("us").alias("grid_us"),
        F.when(
            F.col("prev_us").isNull() | F.col("next_us").isNull(), F.lit(None)
        )
        .otherwise(interp)
        .alias("value_interp"),
    )


# ---------------------------------------------------------------------------
# event_burst_detection
# ---------------------------------------------------------------------------


@query(
    "event_burst_detection",
    oracle="""
WITH b AS (
  SELECT event_type, epoch_us(ts) // 3600000000 AS hour_bucket,
         COUNT(*) AS cnt
  FROM events
  GROUP BY 1, 2
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(cnt) AS sc,
         SUM(CAST(cnt AS HUGEINT) * cnt) AS ssq
  FROM b GROUP BY event_type
)
SELECT b.event_type, b.hour_bucket, b.cnt,
       CAST(s.n * b.cnt - s.sc AS BIGINT) AS excess_n_scaled,
       (s.n * b.cnt > s.sc
        AND CAST(s.n * b.cnt - s.sc AS HUGEINT)
            * CAST(s.n * b.cnt - s.sc AS HUGEINT) * (s.n - 1)
            > 9 * s.n * (s.n * s.ssq - CAST(s.sc AS HUGEINT) * s.sc)) AS burst
FROM b JOIN s ON b.event_type = s.event_type
""",
)
def event_burst_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-burst detection: hourly event counts per type, flagged when a
    bucket exceeds mean + 3σ of that type's bucket distribution. The whole
    3σ test is INTEGER inequality algebra — cnt > μ+3σ rewritten as
    (n·cnt − Σ)²·(n−1) > 9·n·(n·ΣΣ − Σ²) over int128 — so the flag can
    never flip from float rounding, unlike anomaly_zscore's float sigma
    (which is the value-domain sibling; this is the rate domain). Plan:
    one bucketing agg (map-side combinable), one tiny per-type stats agg,
    one broadcast join — the log shuffles once on (type, hour) at any
    scale."""
    e = table(spark, sf_dir, "events").select(
        "event_type",
        F.floor(epoch_us("ts") / F.lit(3_600_000_000)).alias("hour_bucket"),
    )
    b = e.groupBy("event_type", "hour_bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    dec = "decimal(38,0)"
    s = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("sc"),
        F.sum((F.col("cnt").cast(dec) * F.col("cnt")).cast(dec)).alias("ssq"),
    )
    j = b.join(F.broadcast(s), "event_type")
    excess = F.col("n") * F.col("cnt") - F.col("sc")
    lhs = excess.cast(dec) * excess.cast(dec) * (F.col("n") - 1).cast(dec)
    rhs = (
        F.lit(9).cast(dec)
        * F.col("n").cast(dec)
        * (F.col("n").cast(dec) * F.col("ssq") - F.col("sc").cast(dec) * F.col("sc"))
    )
    return j.select(
        "event_type",
        "hour_bucket",
        "cnt",
        excess.cast("long").alias("excess_n_scaled"),
        ((excess > 0) & (lhs > rhs)).alias("burst"),
    )


# ---------------------------------------------------------------------------
# Scale-tier variants (the documented 100 TB swaps, implemented)
# ---------------------------------------------------------------------------


def profile_columns_approx(df: DataFrame, cols: list) -> DataFrame:
    """The 100 TB tier of profile_columns: approx_count_distinct (HLL++,
    one pass, NO expand operator) replaces the exact multi-column
    COUNT(DISTINCT). Same long output shape; distinct counts are estimates
    (rsd 5% default). Accuracy vs the exact profile is pinned in
    tests/test_analytics_ops.py."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for col in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(col)).alias(f"{col}__nulls"),
            F.approx_count_distinct(F.col(col)).alias(f"{col}__distinct"),
            F.min(col).cast("string").alias(f"{col}__min"),
            F.max(col).cast("string").alias(f"{col}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{col}', {col}__nulls, {col}__distinct, {col}__min, {col}__max"
        for col in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(col_name, n_nulls, n_distinct, min_val, max_val)",
        "n_rows",
    ).select("col_name", "n_rows", "n_nulls", "n_distinct", "min_val", "max_val")


def rfm_score_by_cutoffs(u: DataFrame, cutoffs: dict) -> DataFrame:
    """The 100 TB tier of rfm_segmentation: score against BROADCAST
    quantile cutoffs (from percentile_approx over a sample or reference
    period) as a pure map — no per-segment rank windows at all, so scoring
    10⁹ customers is a scan. `cutoffs` maps metric -> ascending 4-value
    breakpoint list; for r_days lower is better, so its score is flipped.
    Input: the (custkey, segment, r_days, f_orders, m_total) aggregate.
    Agreement with the exact rank-based scores is pinned in tests."""

    def score(col: str, breaks: list, flip: bool) -> Column:
        s: Column = F.lit(1)
        for b in breaks:
            s = s + F.when(F.col(col) > F.lit(b), 1).otherwise(0)
        return (F.lit(6) - s).alias(f"{col}_score") if flip else s

    return u.select(
        "custkey",
        "segment",
        "r_days",
        "f_orders",
        "m_total",
        score("r_days", cutoffs["r_days"], flip=True).alias("r_score"),
        score("f_orders", cutoffs["f_orders"], flip=False).alias("f_score"),
        score("m_total", cutoffs["m_total"], flip=False).alias("m_score"),
    )


def rfm_user_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (custkey, segment, R, F, M) aggregate rfm_segmentation builds —
    exposed so both scoring tiers consume the identical metrics."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        epoch_us("o_orderdate").alias("us"),
        scaled_long(F.col("o_totalprice"), 100).alias("price_c"),
    )
    c = table(spark, sf_dir, "customer").select(
        "c_custkey", F.col("c_mktsegment").alias("segment")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("o_custkey").alias("custkey"), "segment")
        .agg(
            F.floor(
                F.greatest(F.lit(_RFM_ASOF_US) - F.max("us"), F.lit(0))
                / F.lit(86_400_000_000)
            ).alias("r_days"),
            F.count(F.lit(1)).alias("f_orders"),
            (F.sum("price_c") / F.lit(100.0)).alias("m_total"),
        )
    )


def mad_summary_approx(e: DataFrame) -> DataFrame:
    """The 100 TB tier of anomaly_mad: percentile_approx medians (t-digest,
    single partial-aggregable pass, no window sorts). Input:
    (event_type, event_id, v_c). Output matches anomaly_mad's shape with
    approximate median/MAD; closeness to the exact tier is pinned in
    tests."""
    med = e.groupBy("event_type").agg(
        F.percentile_approx("v_c", 0.5, 10000).alias("med_c")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("v_c") - F.col("med_c")).alias("dev_c"), "med_c"
    )
    mad = dev.groupBy("event_type").agg(
        F.min("med_c").alias("med_c"),
        F.percentile_approx("dev_c", 0.5, 10000).alias("mad_c"),
    )
    return (
        dev.drop("med_c")
        .join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.min("med_c") / F.lit(100.0)).alias("median_value"),
            (F.min("mad_c") / F.lit(100.0)).alias("mad_value"),
            F.sum(
                F.when(F.col("dev_c") > 3 * F.col("mad_c"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


def write_zordered(df: DataFrame, zcol: Column, path: str, n_files: int = 16):
    """The production write path the Z-order audit feeds: range-partition
    on the Morton code and write, so every output file covers a contiguous
    Z-range and Parquet min/max stats prune on BOTH interleaved dimensions.
    File-level envelope quality is pinned in tests."""
    df.withColumn("zcode", zcol).repartitionByRange(
        n_files, F.col("zcode")
    ).write.mode("overwrite").parquet(path)


def morton_code(x: Column, y: Column) -> Column:
    """Public face of the audit's interleave: 16-bit Morton code column."""
    z: Column = F.lit(0).cast("long")
    for i in range(_Z_BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return z


# ---------------------------------------------------------------------------
# reorder_interval_percentiles
# ---------------------------------------------------------------------------


@query(
    "reorder_interval_percentiles",
    oracle="""
WITH o AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         epoch_us(o.o_orderdate) // 86400000000 AS day, o.o_orderkey
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
g AS (
  SELECT segment, o_custkey,
         day - lag(day) OVER (PARTITION BY o_custkey
                              ORDER BY day, o_orderkey) AS gap_days
  FROM o
),
r AS (
  SELECT segment, gap_days,
         row_number() OVER (PARTITION BY segment ORDER BY gap_days) AS rn,
         COUNT(*) OVER (PARTITION BY segment) AS n
  FROM g WHERE gap_days IS NOT NULL
)
SELECT segment,
       CAST(MIN(n) AS BIGINT) AS n_gaps,
       MIN(CASE WHEN rn = (n + 1) // 2 THEN gap_days END) AS p50_days,
       MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_days END) AS p90_days
FROM r
GROUP BY segment
""",
)
def reorder_interval_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-purchase interval distribution per market segment: exact
    lower-median and lower-p90 of the day gaps between a customer's
    consecutive orders — the repurchase-cadence metric behind churn and
    replenishment models. Gaps come from one customer-keyed lag window;
    the percentile selection is row_number over (gap, tie) per segment —
    total order, so both engines pick the identical element (no
    interpolation ambiguity). Two keyed window passes + one agg; at 100 TB
    the per-segment selection swaps to percentile_approx exactly as in
    mad_summary_approx (same t-digest tier)."""
    o = (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.floor(epoch_us("o_orderdate") / F.lit(86_400_000_000)).alias("day"),
        )
        .join(
            F.broadcast(
                table(spark, sf_dir, "customer").select(
                    F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    wc = Window.partitionBy("o_custkey").orderBy("day", "o_orderkey")
    g = o.select(
        "segment", (F.col("day") - F.lag("day").over(wc)).alias("gap_days")
    ).filter(F.col("gap_days").isNotNull())
    ws = Window.partitionBy("segment")
    r = g.select(
        "segment",
        "gap_days",
        F.row_number().over(ws.orderBy("gap_days")).alias("rn"),
        F.count(F.lit(1)).over(ws).alias("n"),
    )
    return r.groupBy("segment").agg(
        F.min("n").cast("long").alias("n_gaps"),
        F.min(
            F.when(F.col("rn") == F.expr("(n + 1) div 2"), F.col("gap_days"))
        ).alias("p50_days"),
        F.min(
            F.when(
                F.col("rn") == F.expr("(9 * n + 9) div 10"),
                F.col("gap_days"),
            )
        ).alias("p90_days"),
    )


# ---------------------------------------------------------------------------
# agg_gini_inequality
# ---------------------------------------------------------------------------


@query(
    "agg_gini_inequality",
    oracle="""
WITH spend AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS s_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT segment, s_c,
         row_number() OVER (PARTITION BY segment
                            ORDER BY s_c, o_custkey) AS rn,
         COUNT(*) OVER (PARTITION BY segment) AS n
  FROM spend
),
a AS (
  SELECT segment, MIN(n) AS n,
         SUM(CAST(rn AS HUGEINT) * s_c) AS weighted,
         SUM(s_c) AS total
  FROM r GROUP BY segment
)
SELECT segment, CAST(n AS BIGINT) AS n_customers,
       (total / 100.0) AS total_spend,
       -- G = (2·Σ(i·x_i) − (n+1)·Σx) / (n·Σx) over ascending-sorted x;
       -- int128 numerator, ONE double division (VARCHAR hop: see
       -- agg_corr_matrix)
       (CAST(CAST(2 * weighted - (n + 1) * CAST(total AS HUGEINT) AS VARCHAR)
             AS DOUBLE)
        / CAST(CAST(n * CAST(total AS HUGEINT) AS VARCHAR) AS DOUBLE)) AS gini
FROM a
""",
)
def agg_gini_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime spend per market segment —
    the revenue-concentration measure (0 = everyone spends equally,
    →1 = one whale). Uses the exact rank formula
    G = (2·Σ(i·xᵢ) − (n+1)·Σx) / (n·Σx) over ascending-sorted spend:
    one keyed window for ranks, one aggregation — no O(n²) pairwise
    |xᵢ−xⱼ| double sum, which is the formulation that doesn't survive
    scale. The rank-weighted sum accumulates in int128/decimal38 (rank ×
    cents × customers overflows int64) and the coefficient is one double
    division of exactly-converted integers — bit-stable. Ties in spend
    break by custkey, giving both engines the identical rank assignment."""
    spend = (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey", scaled_long(F.col("o_totalprice"), 100).alias("price_c")
        )
        .join(
            F.broadcast(
                table(spark, sf_dir, "customer").select(
                    F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("segment", "o_custkey")
        .agg(F.sum("price_c").alias("s_c"))
    )
    w = Window.partitionBy("segment")
    r = spend.select(
        "segment",
        "s_c",
        F.row_number().over(w.orderBy("s_c", "o_custkey")).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    dec = "decimal(38,0)"
    a = r.groupBy("segment").agg(
        F.min("n").alias("n"),
        F.sum((F.col("rn").cast(dec) * F.col("s_c")).cast(dec)).alias("weighted"),
        F.sum("s_c").alias("total"),
    )
    num = (
        F.lit(2).cast(dec) * F.col("weighted")
        - (F.col("n") + 1).cast(dec) * F.col("total").cast(dec)
    ).cast(dec)
    den = (F.col("n").cast(dec) * F.col("total").cast(dec)).cast(dec)
    return a.select(
        "segment",
        F.col("n").cast("long").alias("n_customers"),
        (F.col("total") / F.lit(100.0)).alias("total_spend"),
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


# ---------------------------------------------------------------------------
# agg_concentration_ratio
# ---------------------------------------------------------------------------


@query(
    "agg_concentration_ratio",
    oracle="""
WITH spend AS (
  SELECT c.c_mktsegment AS segment, o.o_custkey,
         SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS s_c
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
r AS (
  SELECT segment, s_c,
         row_number() OVER (PARTITION BY segment
                            ORDER BY s_c DESC, o_custkey) AS rn
  FROM spend
)
SELECT segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       (SUM(CASE WHEN rn <= 10 THEN s_c ELSE 0 END)
        / (1.0 * SUM(s_c))) AS cr10,
       (SUM(CASE WHEN rn <= 1 THEN s_c ELSE 0 END)
        / (1.0 * SUM(s_c))) AS cr1
FROM r
GROUP BY segment
""",
)
def agg_concentration_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration ratios CR₁/CR₁₀ per market segment: the revenue share
    of the single biggest and the ten biggest customers — the whale metric
    that complements agg_gini_inequality (Gini summarizes the whole curve;
    CR-k answers "how exposed are we to the top"). One rank window per
    segment over the per-customer spend aggregate, then conditional
    integer sums and a single double division — bit-stable; ties in spend
    break on custkey so the top-k cut is identical in both engines. The
    windows run over the aggregated customer dimension, and at 100 TB the
    orders→spend agg is the only large shuffle (same input as RFM/Gini —
    one staged spend table serves all three in production)."""
    spend = (
        table(spark, sf_dir, "orders")
        .select(
            "o_custkey", scaled_long(F.col("o_totalprice"), 100).alias("price_c")
        )
        .join(
            F.broadcast(
                table(spark, sf_dir, "customer").select(
                    F.col("c_custkey"), F.col("c_mktsegment").alias("segment")
                )
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("segment", "o_custkey")
        .agg(F.sum("price_c").alias("s_c"))
    )
    w = Window.partitionBy("segment").orderBy(F.desc("s_c"), "o_custkey")
    r = spend.select("segment", "s_c", F.row_number().over(w).alias("rn"))
    top = lambda k: F.sum(F.when(F.col("rn") <= k, F.col("s_c")).otherwise(0))
    return r.groupBy("segment").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        (top(10) / (F.lit(1.0) * F.sum("s_c"))).alias("cr10"),
        (top(1) / (F.lit(1.0) * F.sum("s_c"))).alias("cr1"),
    )


# ---------------------------------------------------------------------------
# session_conversion_by_length
# ---------------------------------------------------------------------------


@query(
    "session_conversion_by_length",
    oracle=f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
g AS (
  SELECT user_id, event_id, event_type, us,
         CASE WHEN us - lag(us) OVER w > {_SESSION_GAP_US} OR
                   lag(us) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
s AS (
  SELECT user_id, event_type,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS session_seq
  FROM g),
sess AS (
  SELECT user_id, session_seq,
         COUNT(*) AS n_events,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted
  FROM s GROUP BY 1, 2)
SELECT CAST(n_events AS BIGINT) AS session_length,
       CAST(COUNT(*) AS BIGINT) AS n_sessions,
       CAST(SUM(converted) AS BIGINT) AS n_converted,
       SUM(converted) / (1.0 * COUNT(*)) AS conversion_rate
FROM sess
GROUP BY n_events
""",
)
def session_conversion_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-outcome analytics: does session length predict purchase?
    Gap-based sessions (same 30-min kernel as sessionize_batch), each
    flagged converted if it contains a purchase, rolled up to conversion
    rate per session length — the engagement-vs-intent curve a product
    team reads before touching the funnel.

    Same single user-keyed shuffle as the sessionization kernel (lag-flag
    + running sum + per-session rollup share the partitioning); the final
    group is the tiny length histogram. The rate is one int/int division,
    identical in both engines."""
    e = table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", epoch_us("ts").alias("us")
    )
    s = assign_session_seq(e)  # the ONE session definition (see the kernel)
    sess = s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted"),
    )
    return sess.groupBy(F.col("n_events").cast("long").alias("session_length")).agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converted"),
        (F.sum("converted") / (F.lit(1.0) * F.count(F.lit(1)))).alias(
            "conversion_rate"
        ),
    )
