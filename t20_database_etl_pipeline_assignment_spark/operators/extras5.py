"""Round-5 additions to the §2.L surface: nearest-neighbor as-of join,
temperature-scaled corpus mixing, and bounded-hop label propagation.

Reference parity: the reference declares event matching / "match data"
(reference README.md:2), weighted sampling-style curation is the
LLM-pipeline mandate (BASELINE.json:6), and community labeling extends
the dedup clustering family (README.md:6 dimensions / dedup).

Each operator keeps the repo's determinism discipline: integer
arithmetic for every cut line (isqrt-style weights via FLOOR(SQRT()) —
exact for any realistic count since correctly-rounded sqrt can't cross
an integer below ~2^40), md5-derived 60-bit priorities identical on both
engines, and total-order tie-breaks ending in a unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..exprs import epoch_us
from ..registry import query
from ..sources.tables import table
from .llm import _sql_hash60, hash60
from .quality import _SQL_JACCARD_GRAPH, _cached_sym_graph


@query(
    "join_asof_nearest",
    oracle="""
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
         last_value(click_id IGNORE NULLS) OVER wb AS prev_id,
         last_value(click_us IGNORE NULLS) OVER wb AS prev_us,
         first_value(click_id IGNORE NULLS) OVER wf AS next_id,
         first_value(click_us IGNORE NULLS) OVER wf AS next_us
  FROM u
  WINDOW wb AS (PARTITION BY user_id ORDER BY us, kind, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY user_id ORDER BY us, kind, event_id
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
       CASE WHEN prev_us IS NOT NULL
              AND (next_us IS NULL OR us - prev_us <= next_us - us)
            THEN prev_id ELSE next_id END AS click_id,
       CASE WHEN prev_us IS NOT NULL
              AND (next_us IS NULL OR us - prev_us <= next_us - us)
            THEN us - prev_us
            WHEN next_us IS NOT NULL THEN next_us - us END AS gap_us,
       CASE WHEN prev_us IS NOT NULL
              AND (next_us IS NULL OR us - prev_us <= next_us - us)
            THEN 'backward'
            WHEN next_us IS NOT NULL THEN 'forward' END AS direction
FROM m
WHERE kind = 1
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of match in EITHER direction: each purchase is
    attributed to the same user's temporally closest click — the backward
    candidate on ties (a click can cause a purchase, not the reverse).
    Same 100 TB shape as join_asof_tolerance: one union + two running
    ignore-nulls windows over a single user_id shuffle, cost independent
    of history length, zero candidate fan-out — where a naive
    nearest-neighbor range join explodes quadratically per user. Ordering
    (us, kind, event_id) sorts a simultaneous click before the purchase,
    so a zero-gap click is the backward candidate on both engines."""
    e = table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_click = F.col("event_type") == "click"
    u = e.select(
        "user_id",
        "event_id",
        epoch_us("ts").alias("us"),
        F.when(is_click, 0).otherwise(1).alias("kind"),
        F.when(is_click, F.col("event_id")).alias("click_id"),
        F.when(is_click, epoch_us("ts")).alias("click_us"),
    )
    order = [F.col("us"), F.col("kind"), F.col("event_id")]
    wb = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # next_* via the reversed-order RUNNING frame (r11, same move as
    # resample_interpolate_linear): Spark's unbounded-following frame is
    # O(rows²) per partition; (us, kind, event_id) is a strict total
    # order per user, so running last over the descending mirror is
    # value-identical to first over the forward suffix in O(rows).
    wf = (
        Window.partitionBy("user_id")
        .orderBy(*[c.desc() for c in order])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    m = u.select(
        "user_id",
        "event_id",
        "us",
        "kind",
        F.last("click_id", ignorenulls=True).over(wb).alias("prev_id"),
        F.last("click_us", ignorenulls=True).over(wb).alias("prev_us"),
        F.last("click_id", ignorenulls=True).over(wf).alias("next_id"),
        F.last("click_us", ignorenulls=True).over(wf).alias("next_us"),
    )
    prefer_prev = F.col("prev_us").isNotNull() & (
        F.col("next_us").isNull()
        | ((F.col("us") - F.col("prev_us")) <= (F.col("next_us") - F.col("us")))
    )
    has_next = F.col("next_us").isNotNull()
    return m.filter(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        F.when(prefer_prev, F.col("prev_id"))
        .otherwise(F.col("next_id"))
        .alias("click_id"),
        F.when(prefer_prev, F.col("us") - F.col("prev_us"))
        .when(has_next, F.col("next_us") - F.col("us"))
        .alias("gap_us"),
        F.when(prefer_prev, F.lit("backward"))
        .when(has_next, F.lit("forward"))
        .alias("direction"),
    )


@query(
    "mix_temperature_sampled",
    oracle=f"""
WITH w AS (
  SELECT lang, COUNT(*) AS n_docs,
         CAST(FLOOR(SQRT(CAST(COUNT(*) AS DOUBLE))) AS BIGINT) AS wt
  FROM documents GROUP BY lang),
tot AS (SELECT SUM(wt) AS wt_sum, SUM(n_docs) AS n_total FROM w),
quota AS (
  SELECT lang, wt, ((n_total // 2) * wt) // wt_sum AS n_quota
  FROM w CROSS JOIN tot),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY {_sql_hash60("CAST(doc_id AS VARCHAR) || '@' || lang")}, doc_id
         ) AS rk
  FROM documents)
SELECT r.doc_id, r.lang, CAST(q.wt AS BIGINT) AS wt,
       CAST(q.n_quota AS BIGINT) AS n_quota
FROM ranked r JOIN quota q USING (lang)
WHERE r.rk <= q.n_quota
""",
)
def mix_temperature_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language sampling (the multilingual-pretraining
    upsampling rule, alpha = 0.5): each language's mixing weight is
    n_docs^0.5, so low-resource languages are over-represented relative to
    their raw share without head languages drowning the mix. The exponent
    is computed as FLOOR(SQRT(n)) — an exact integer on both engines
    (IEEE-correctly-rounded sqrt cannot cross an integer boundary at any
    realistic corpus count) — and every downstream cut line is integer
    DIV, so the selected set is bit-identical. Same scale shape as
    mix_weighted: one broadcast quota row per language, one per-language
    ranking window, no global sort."""
    d = table(spark, sf_dir, "documents").select("doc_id", "lang")
    w = (
        d.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "wt", F.expr("CAST(FLOOR(SQRT(CAST(n_docs AS DOUBLE))) AS BIGINT)")
        )
    )
    tot = w.agg(F.sum("wt").alias("wt_sum"), F.sum("n_docs").alias("n_total"))
    quota = (
        w.crossJoin(F.broadcast(tot))  # 1-row scalar totals
        .withColumn("n_quota", F.expr("((n_total DIV 2) * wt) DIV wt_sum"))
        .select("lang", "wt", "n_quota")
    )
    pri = hash60(F.concat(F.col("doc_id").cast("string"), F.lit("@"), F.col("lang")))
    rk = F.row_number().over(Window.partitionBy("lang").orderBy(pri, F.col("doc_id")))
    return (
        d.withColumn("rk", rk)
        .join(F.broadcast(quota), "lang")
        .filter(F.col("rk") <= F.col("n_quota"))
        .select(
            "doc_id",
            "lang",
            F.col("wt").cast("long").alias("wt"),
            F.col("n_quota").cast("long").alias("n_quota"),
        )
    )


@query(
    "sql_disjunctive_filter_join",
    oracle="""
SELECT p_brand,
       SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * CAST(10000 AS DOUBLE)
                      + CAST(0.5 AS DOUBLE)) AS BIGINT))
         / CAST(10000 AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
GROUP BY p_brand
""",
)
def sql_disjunctive_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-shaped disjunctive predicate join ("discounted revenue"):
    an OR-of-ANDs mixing dimension attributes (p_brand, p_size) with fact
    measures (l_quantity) across the join. The optimizer surface this
    exercises: Catalyst extracts the column-local disjunction envelopes —
    `p_brand IN (...)`, `p_size <= 15`, `l_quantity <= 30` — and pushes
    them into BOTH scans (PushedFilters on each side) even though the full
    predicate can only be evaluated above the join; the join itself stays
    a broadcast equi-join on partkey with the residual OR as its
    post-condition. At 100 TB the pushed envelopes are what keep the fact
    scan from reading every row group before the residual filter runs."""
    for t in ("lineitem", "part"):
        table(spark, sf_dir, t).createOrReplaceTempView(f"v_{t}")
    return spark.sql(
        """
        SELECT /*+ BROADCAST(v_part) */ p_brand,
          SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * CAST(10000 AS DOUBLE)
                         + CAST(0.5 AS DOUBLE)) AS BIGINT))
            / CAST(10000 AS DOUBLE) AS revenue,
          COUNT(*) AS n_items
        FROM v_lineitem JOIN v_part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 20 AND 30)
        GROUP BY p_brand
        """
    )


@query(
    "text_bpe_pair_counts",
    oracle="""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
pairs AS (
  SELECT unnest(list_transform(range(1, len(tok)), i -> substr(tok, i, 2))) AS pair
  FROM toks WHERE len(tok) >= 2),
counted AS (SELECT pair, COUNT(*) AS n FROM pairs GROUP BY pair)
SELECT pair, CAST(n AS BIGINT) AS n
FROM counted ORDER BY n DESC, pair ASC LIMIT 20
""",
)
def text_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding merge round: the corpus-wide frequency of
    every adjacent character pair inside tokens, top-20 — the statistic a
    BPE tokenizer trainer computes (and re-computes per merge) to pick the
    next merge rule. All JVM higher-order functions: split -> explode ->
    `transform(sequence(...))` sliding pairs -> explode -> one keyed
    count, then TakeOrderedAndProject for the top-k (per-partition heaps,
    no global sort). Deterministic cut line: (n DESC, pair ASC). At 100 TB
    the pair alphabet is bounded (|charset|^2 keys), so the final agg
    state is tiny regardless of corpus size — map-side partials do nearly
    all the work."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split(F.col("text"), " ")).alias("tok")).filter(
        F.length("tok") >= 2
    )
    pairs = toks.select(
        F.explode(
            F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("pair"))
        .limit(20)
    )


_LP_ITERS = 3


def _sql_lp_iter(prev: str, cur: str) -> str:
    return f""",
{cur} AS (
  SELECT node, MIN(lbl) AS lbl FROM (
    SELECT node, lbl FROM {prev}
    UNION ALL
    SELECT s.dst AS node, p.lbl FROM sym s JOIN {prev} p ON p.node = s.src
  ) GROUP BY node)"""


@query(
    "graph_label_propagation",
    oracle=(
        "WITH "
        + _SQL_JACCARD_GRAPH.strip().rstrip()
        + ",\nl0 AS (SELECT doc_id AS node, doc_id AS lbl FROM docs_in)"
        + "".join(_sql_lp_iter(f"l{i}", f"l{i+1}") for i in range(_LP_ITERS))
        + "\nSELECT node AS doc_id, CAST(lbl AS BIGINT) AS label FROM"
        f" l{_LP_ITERS}"
    ),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous min-label propagation over the shared similarity graph:
    after k = 3 rounds every node carries the smallest doc_id within 3
    hops — the bounded-diameter community labeling that converges to
    cluster_connected_components' answer on small-diameter components but
    costs a FIXED number of rounds (the production trade for billion-node
    graphs where full CC's O(log n) rounds are budgeted per-tier).
    Deterministic: min is order-free; each round is one join + one
    min-aggregate on node id over the persisted edge artifact, with
    localCheckpoint lineage control exactly like CC/PageRank."""
    edges = _cached_sym_graph(spark, sf_dir)  # symmetric (src, dst)
    d = table(spark, sf_dir, "documents").select("doc_id")
    nodes = d.unionByName(d.select((F.col("doc_id") + 1_000_000).alias("doc_id")))
    lab = nodes.select(F.col("doc_id").alias("node"), F.col("doc_id").alias("lbl"))
    for _ in range(_LP_ITERS):
        prop = (
            edges.join(lab, edges["src"] == lab["node"])
            .select(F.col("dst").alias("node"), "lbl")
        )
        lab = (
            lab.unionByName(prop)
            .groupBy("node")
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint()
        )
    return lab.select(F.col("node").alias("doc_id"), F.col("lbl").cast("long").alias("label"))
