"""Physical-plan regression tests (100 TB design gate, SURVEY.md §4).

Correctness tests prove the small-SF answer; these prove the *plan shape*
that must survive a 1000-executor scale-up: dimension joins broadcast (never
sort-merge), predicates and projections reach the Parquet scan, global top-k
uses TakeOrderedAndProject (per-partition heaps, no global sort), and
aggregations are partial (map-side combine) with a single shuffle.
"""

from __future__ import annotations

from t20_database_etl_pipeline_assignment_spark.plans.inspect import plan_string as plan_of
from t20_database_etl_pipeline_assignment_spark.registry import QUERIES


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    plan = plan_of(QUERIES["join_multiway_star"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 4, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_star_join_pushes_shipdate_filter(spark, sf_dir):
    plan = plan_of(QUERIES["join_multiway_star"](spark, sf_dir))
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan, plan


def test_star_join_prunes_lineitem_columns(spark, sf_dir):
    plan = plan_of(QUERIES["join_multiway_star"](spark, sf_dir))
    # the fact-table scan must read only the join key + measures + filter col
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_extendedprice:double,"
        "l_discount:double,l_shipdate:timestamp_ntz>" in plan
    ), plan


def test_filter_pred_pushes_down(spark, sf_dir):
    plan = plan_of(QUERIES["filter_pred"](spark, sf_dir))
    assert "GreaterThanOrEqual(o_totalprice,50000.0)" in plan, plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(QUERIES["topk_global"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_agg_is_partial_with_single_exchange(spark, sf_dir):
    plan = plan_of(QUERIES["agg_hash_group"](spark, sf_dir), mode="simple")
    assert plan.count("HashAggregate") == 2, plan  # partial + final
    assert plan.count("Exchange") == 1, plan


def test_broadcast_hint_respected(spark, sf_dir):
    plan = plan_of(QUERIES["join_broadcast"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Bucketing both sides on the join key must eliminate the shuffle: the
    fact⋈fact join reads bucketed scans directly, no Exchange below the
    join (the only allowed Exchange is the final tiny groupBy)."""
    df = QUERIES["join_bucketed_colocated"](spark, sf_dir)
    plan = plan_of(df, mode="simple")
    assert "SortMergeJoin" in plan, plan
    assert "SelectedBucketsCount" in plan_of(df), plan_of(df)
    assert plan.count("Exchange") == 1, plan  # the post-join aggregation only


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """A fact table partitioned on the join key, joined to a filtered dim,
    must scan only the partitions the dim selects — Spark's dynamic
    partition pruning (the runtime counterpart of static pruning). This is
    the mechanism that makes the partitioned sink layout pay off at 100 TB."""
    from pyspark.sql import functions as F

    from t20_database_etl_pipeline_assignment_spark.sources.tables import table

    path = str(tmp_path / "orders_by_year")
    (
        table(spark, sf_dir, "orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    fact = spark.read.parquet(path)
    dim = spark.range(1995, 2002).select(
        F.col("id").alias("d_year"), (F.col("id") % 2 == 0).alias("is_even")
    )
    joined = fact.join(
        F.broadcast(dim.filter(F.col("is_even"))), fact["o_year"] == dim["d_year"]
    ).groupBy("o_year").count()
    plan = plan_of(joined)
    assert "dynamicpruning" in plan.lower(), plan


def test_partitioned_twins_prune(spark, sf_dir):
    """The partitioned-at-rest twins (operators/partitioned.py) must carry
    their coarse date predicates as PartitionFilters on the scan — i.e.
    directory pruning on the hive-partitioned fact copy, not a full scan
    plus in-memory filter — and the DPP twin must derive its partition
    filter dynamically from the broadcast month dim."""
    static_twins = {
        "scan_partitioned_pruned": "l_shipmonth",
        "sql_flagship_star_partitioned": "l_shipmonth",
        "sql_unshipped_revenue_topk_partitioned": "o_ordermonth",
        "stream_tumbling_partitioned": "event_date",
    }
    for qid, pcol in static_twins.items():
        plan = plan_of(QUERIES[qid](spark, sf_dir))
        import re

        filters = [
            m for m in re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
            if pcol in m and (">=" in m or "<" in m)
        ]
        assert filters, f"{qid}: no pruning PartitionFilters on {pcol}\n{plan}"
    dpp = plan_of(QUERIES["join_dpp_month_dim"](spark, sf_dir))
    assert "dynamicpruningexpression" in dpp, dpp


def test_salted_join_spreads_keys(spark, sf_dir):
    """The salted join must shuffle on (key, salt) — visible as the salt
    column in the join keys — and still broadcast the tiny nation dim."""
    plan = plan_of(QUERIES["join_skew_salted"](spark, sf_dir))
    assert "salt" in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_stratified_sample_is_pure_map(spark, sf_dir):
    """Hash-mod sampling must stay a scan + filter + project: any Exchange
    means the 100 TB sample pays a shuffle it doesn't need."""
    plan = plan_of(QUERIES["sample_stratified"](spark, sf_dir), mode="simple")
    assert "Exchange" not in plan, plan


def test_mix_weighted_broadcasts_quota(spark, sf_dir):
    """The per-source quota table (one row per source) must broadcast; the
    only shuffle the documents side pays is the ranking window's."""
    plan = plan_of(QUERIES["mix_weighted"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_seq_pack_single_shuffle_chain(spark, sf_dir):
    """Offset binning = one window partition-by-source plus the final
    aggregate; no join, no cartesian anywhere in the plan."""
    plan = plan_of(QUERIES["seq_pack_budget"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "Join" not in plan, plan


# Queries where BroadcastNestedLoopJoin is legitimate: a broadcast 1-row
# scalar aggregate (watermark, corpus totals, quota denominators) or the
# intentionally bounded cross join. Anything new showing a BNLJ must be
# reviewed and listed here, or it fails the sweep.
_BNLJ_ALLOWED = {
    "incr_load_watermark",   # 1-row max-watermark broadcast
    "stream_late_data",      # 1-row max-event-time broadcast
    "funnel_conversion",     # 1-row step-total broadcast
    "key_skew_profile",      # 1-row mean-count broadcast
    "text_tfidf_topterms",   # 1-row corpus-size broadcast
    "sim_cosine_topk",       # tiny query-set broadcast, no equi key
    "sim_ann_ivf",           # 1-row centroid-count broadcast
    "sim_ann_ivf_adc",       # 16-row centroid broadcast (probe ranking)
    "sim_ann_ivf_pq",        # 1-row broadcast codebook map (~32 KB) + the
    #                          16-row centroid broadcast (probe ranking)
    "sim_ann_ivf_pq_refine", # same PQ probe plan (shared _pq_candidates);
    #                          the re-rank itself is a keyed broadcast join
    #                          (pinned in test_pq_refine_rerank_is_broadcast)
    "emb_kmeans_inertia",    # 1-row broadcast centroid-array (k centroids
    #                          collapse to one row; assignment stays narrow)
    "sim_ann_ivf_recall_curve",  # exact-truth query-set broadcast (as
    #                          sim_cosine_topk) + 4-row nprobe x tiny
    #                          hits/1-row count broadcasts
    "dedup_minhash_band_sweep",  # 1-row truth-count broadcast
    "dedup_cascade",         # 1-row stage-count arithmetic
    "agg_heavy_hitters",     # 1-row grand-total broadcast
    "mix_weighted",          # 1-row weight-sum/budget broadcast
    "mix_temperature_sampled",  # 1-row weight-sum/budget broadcast
    "join_cross",            # the cross join operator itself (bounded dims)
    "graph_pagerank",        # 1-row node-count broadcast (base-mass term)
    "text_bm25_topk",        # 1-row corpus-size/avgdl/df broadcasts
    "emb_matryoshka_recall", # tiny query-set broadcast, no equi key
    "zorder_cluster_audit",  # 1-row min/max-stats broadcast (grid normalization)
    "market_basket_pairs",   # 1-row order-count broadcast (support denominator)
    "stream_scd2_late_reconcile",  # 1-row head-day broadcast
    "user_lifecycle_weekly",  # 1-row max-week broadcast (churn frontier)
    "sql_dormant_high_value",  # 1-row balance-threshold broadcast
    "text_surprisal_score",   # 1-row corpus-token-total broadcast
    "geo_grid_distance_join",  # 9-row neighbor-offset broadcast (3x3 cells)
    "agg_kmv_intersection",  # 1-row per-side KMV-sketch broadcast (bounded top-64)
    "join_skew_salted",      # 1-row total-count broadcast (hot-key threshold)
    "sql_value_share_threshold",  # 1-row total/part-count broadcast (Q11 scalar)
    "sql_supplier_cnt_by_parttype",  # 1-row balance-average broadcast (Q16 excl)
}
_PY_ROW_ALLOWED = {"udf_python_scalar", "udtf_explode_custom"}  # §2.K escape hatches
# Queries allowed an unbounded global sort (none expected; review any addition)
_GLOBAL_SORT_ALLOWED: set[str] = set()
# Queries allowed a SortMergeJoin with a sub-broadcast-threshold side:
_SMJ_SMALL_ALLOWED = {
    "join_bucketed_colocated",  # bucketed SMJ with ZERO exchanges is the
                                # demonstrated plan shape — broadcasting
                                # would defeat the co-location demo
}


def test_plan_sweep_no_scale_antipatterns(spark, sf_dir):
    """Whole-surface gate: EVERY registered query's physical plan passes the
    plan linter (plans/lint.py) — no unbounded cartesian products, no
    row-at-a-time Python eval, no unbounded single-task global sorts, and
    any BroadcastNestedLoopJoin is on the reviewed scalar-broadcast
    allowlist. This is the test that catches a future operator quietly
    regressing into a driver-side or quadratic shape."""
    from t20_database_etl_pipeline_assignment_spark.plans.lint import lint

    offenders = {}
    for qid, fn in QUERIES.items():
        allow = set()
        if qid in _BNLJ_ALLOWED:
            allow.add("bnlj")
        if qid in _PY_ROW_ALLOWED:
            allow.add("row_python")
        if qid in _GLOBAL_SORT_ALLOWED:
            allow.add("global_sort")
        if qid in _SMJ_SMALL_ALLOWED:
            allow.add("smj_small_side")
        findings = lint(fn(spark, sf_dir), allow=allow)
        if findings:
            offenders[qid] = [code for code, _ in findings]
    assert not offenders, offenders


def test_q3_composite_plan_shape(spark, sf_dir):
    """The Q3-shaped composite must broadcast customer, push both date
    predicates and the segment filter into the scans, and take the global
    top-10 with per-partition heaps (TakeOrderedAndProject), not a global
    sort."""
    plan = plan_of(QUERIES["sql_unshipped_revenue_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan, plan
    assert "GreaterThan(l_shipdate," in plan, plan
    assert "LessThan(o_orderdate," in plan, plan


def test_exists_subquery_decorrelates_to_semi_anti(spark, sf_dir):
    """Correlated EXISTS / NOT EXISTS must compile to hash semi/anti joins
    (one pass over orders each), never a per-row subquery execution."""
    plan = plan_of(QUERIES["sql_exists_subquery"](spark, sf_dir), mode="simple")
    assert "LeftSemi" in plan or "Semi" in plan, plan
    assert "LeftAnti" in plan or "Anti" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_corpus_shard_single_shuffle_no_global_sort(spark, sf_dir):
    """Shard assignment is a pure map; only the per-shard rank shuffles.
    One hash exchange, and no global (single-partition) sort anywhere."""
    plan = plan_of(QUERIES["corpus_shuffle_shard"](spark, sf_dir), mode="simple")
    assert plan.count("Exchange") == 1, plan
    assert "SinglePartition" not in plan, plan


def test_pq_refine_rerank_is_broadcast(spark, sf_dir):
    """The refine tier's full-precision fetch must be a keyed BROADCAST
    join of the c*|Q|-row candidate list against the corpus scanned once
    (point-lookup shape) — never a sort-merge join, which would shuffle
    the float corpus to re-rank 320 rows."""
    plan = plan_of(QUERIES["sim_ann_ivf_pq_refine"](spark, sf_dir), mode="simple")
    assert "SortMergeJoin" not in plan, plan
    assert "BroadcastHashJoin [neighbor_id" in plan, plan


def test_dedup_prefix_shuffles_digests_not_text(spark, sf_dir):
    """Both md5 digests must be computed below the exchange so the shuffle
    moves 32 bytes/row, never document text."""
    plan = plan_of(QUERIES["dedup_prefix"](spark, sf_dir), mode="formatted")
    # both exchanges partition on digest columns
    assert "hashpartitioning(prefix_md5" in plan, plan
    # the text column never flows through an Exchange: collect each Exchange
    # node's Input schema from the formatted detail blocks
    lines = plan.splitlines()
    exchange_ids = [
        line.split("Exchange (")[1].rstrip(")")
        for line in lines
        if line.strip().endswith(")") and "Exchange (" in line
    ]
    assert exchange_ids, plan
    for i, line in enumerate(lines):
        if any(line.startswith(f"({eid}) Exchange") for eid in exchange_ids):
            block = "\n".join(lines[i : i + 4])
            assert "text#" not in block, block


def test_length_buckets_partial_agg(spark, sf_dir):
    plan = plan_of(QUERIES["batch_length_buckets"](spark, sf_dir), mode="simple")
    assert plan.count("HashAggregate") == 2, plan  # map-side combine
    assert plan.count("Exchange") == 1, plan


def test_peak_concurrency_broadcasts_maxima(spark, sf_dir):
    """The per-type maxima table (|event types| rows) must broadcast; the
    big side is one window pass, never an interval self-join."""
    plan = plan_of(QUERIES["interval_peak_concurrency"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_span_dedup_never_forms_doc_pairs(spark, sf_dir):
    """The span-level dup signal must stay linear: joins only on span /
    doc_id hash keys — no doc×doc join shape (that is the quadratic stage
    it exists to avoid)."""
    plan = plan_of(QUERIES["dedup_span_ngram"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "SortMergeJoin" not in plan, plan  # all joins hash, keys well-typed


def test_rarity_score_joins_on_token_copartitioned(spark, sf_dir):
    """Corpus counts join back to the token stream co-partitioned on tok:
    exactly one exchange carries the exploded stream, one the final doc
    fold."""
    plan = plan_of(QUERIES["text_rarity_score"](spark, sf_dir), mode="simple")
    assert "hashpartitioning(tok" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_bm25_topk_uses_heap_topk_and_broadcast_stats(spark, sf_dir):
    """BM25 global top-10 must be per-partition heaps
    (TakeOrderedAndProject), with every corpus statistic arriving as a
    1-row broadcast — no global sort, no shuffled stats join."""
    plan = plan_of(QUERIES["text_bm25_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_lint_no_pushdown_detects_empty_pushed_filters():
    """The no_pushdown gate: a pushable literal comparison filtering a scan
    whose PushedFilters is empty must flag; the same predicate with a
    populated PushedFilters, or a non-pushable (function-wrapped) one over
    an empty list, must not."""
    from t20_database_etl_pipeline_assignment_spark.plans.lint import lint_text

    bad = (
        "(1) Scan parquet\n"
        "Output [2]: [l_orderkey#0L, l_quantity#4]\n"
        "Location: InMemoryFileIndex [file:/x]\n"
        "PushedFilters: []\n"
        "ReadSchema: struct<l_orderkey:bigint,l_quantity:double>\n\n"
        "(2) Filter\n"
        "Input [2]: [l_orderkey#0L, l_quantity#4]\n"
        "Condition : (isnotnull(l_quantity#4) AND (l_quantity#4 > 30.0))\n"
    )
    codes = [c for c, _ in lint_text(bad)]
    assert "no_pushdown" in codes

    good = bad.replace(
        "PushedFilters: []",
        "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,30.0)]",
    )
    assert "no_pushdown" not in [c for c, _ in lint_text(good)]

    # function-wrapped column: not pushable-as-written, must not flag
    wrapped = bad.replace(
        "Condition : (isnotnull(l_quantity#4) AND (l_quantity#4 > 30.0))",
        "Condition : (round(l_quantity#4, 1) > 30.0)",
    )
    assert "no_pushdown" not in [c for c, _ in lint_text(wrapped)]

    assert lint_text(bad, allow={"no_pushdown"}) == []


def test_lint_smj_small_side_eligibility(spark, sf_dir):
    """The smj_small_side gate: an inner SMJ whose sides are under the
    broadcast threshold flags; a full-outer SMJ (cannot broadcast) and a
    left-anti SMJ whose only SMALL side is the non-buildable left do not."""
    from t20_database_etl_pipeline_assignment_spark.plans.lint import lint

    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # plan with broadcast effectively disabled -> static planner picks
        # SMJ; then lint the frozen plans under a 4kb threshold so only the
        # kilobyte-scale dims (nation/region) count as "small"
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1b")
        inner = n.join(r, n.n_regionkey == r.r_regionkey)
        fo = n.join(r, n.n_regionkey == r.r_regionkey, "full_outer")
        anti = n.join(li, n.n_nationkey == li.l_suppkey, "left_anti")
        for df in (inner, fo, anti):
            df._jdf.queryExecution().executedPlan()  # freeze the plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4kb")

        assert "smj_small_side" in [c for c, _ in lint(inner)]
        assert lint(inner, allow={"smj_small_side"}) == []
        assert "smj_small_side" not in [c for c, _ in lint(fo)]
        # left-anti: the tiny LEFT side is not broadcast-eligible, and the
        # right side is above the 4kb threshold, so nothing flags
        assert "smj_small_side" not in [c for c, _ in lint(anti)]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_vocab_coverage_broadcasts_vocab_heap_topk(spark, sf_dir):
    """The vocabulary derivation must be a per-partition-heap top-k (never a
    global sort) and the OOV probe must broadcast the tiny vocab to the
    token stream — at 100 TB the corpus side cannot shuffle for a 256-row
    build side."""
    plan = plan_of(QUERIES["text_vocab_coverage"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_cluster_canonical_election_has_no_window(spark, sf_dir):
    """The survivor election must be a partial-aggregable groupBy-argmax —
    a per-cluster sort window would serialize every cluster through a
    range partitioner at 100 TB."""
    plan = plan_of(QUERIES["dedup_cluster_canonical"](spark, sf_dir))
    assert "Window" not in plan, plan


def test_large_volume_prunes_before_broadcast_joins(spark, sf_dir):
    """Q18's join chain must be broadcast-only: the HAVING-pruned big-order
    list is the build side into orders, and the still-tiny result the build
    side into customer — lineitem must never shuffle-join orders."""
    plan = plan_of(QUERIES["sql_large_volume_customer"](spark, sf_dir))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_order_count_distribution_join_is_outer_and_one_exchange(spark, sf_dir):
    """Q13's per-customer count must ride the outer join's custkey exchange:
    exactly the join shuffles plus ONE tiny final exchange for the histogram
    — a plan that re-shuffles customers for the first groupBy would double
    the biggest exchange at 100 TB."""
    df = QUERIES["sql_order_count_distribution"](spark, sf_dir)
    plan = plan_of(df)
    assert "LeftOuter" in plan, plan
    # exchanges: customer-side, orders-side, final histogram fold; the
    # per-customer aggregate itself must NOT add a fourth
    assert plan.count("Exchange hashpartitioning") <= 3, plan


def test_supplier_cnt_exclusion_is_broadcast_anti(spark, sf_dir):
    """Q16's NOT IN must plan as a broadcast left-anti join (null-free keys)
    — at 100 TB the distinct pair stream cannot shuffle against a
    supplier-sized exclusion list."""
    plan = plan_of(QUERIES["sql_supplier_cnt_by_parttype"](spark, sf_dir))
    assert "LeftAnti, BuildRight" in plan or (
        "LeftAnti" in plan and "BroadcastHashJoin" in plan
    ), plan
    assert "SortMergeJoin" not in plan, plan


def test_boilerplate_scrub_is_linear_no_pairs(spark, sf_dir):
    """The scrub must stay linear AND narrow: nothing forms doc-pair
    fan-out (no cartesian / BNLJ), and — the sf10 memory fix — no exchange
    in the segment-frequency pipeline may carry segment text (`seg#`) or
    raw document text (`text#`); those shuffles move only the 8-byte
    xxhash64 keys / ids. The one place text MAY cross an exchange is the
    doc-keyed reassembly join's segment-array side (`segs#`) — and only
    when the removed-index side doesn't broadcast — so `segs#` is capped
    at one exchange, keeping a regression that shuffles segment arrays
    through the frequency pipeline impossible."""
    from t20_database_etl_pipeline_assignment_spark.plans.lint import lint

    df = QUERIES["text_boilerplate_scrub"](spark, sf_dir)
    assert lint(df) == []
    plan = plan_of(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "xxhash64" in plan, plan  # digest-before-shuffle is in effect
    # formatted plan: each "(N) Exchange" section lists its Input columns;
    # raw segment text is `seg#N` (seg_idx#/seg_key# don't match), raw
    # document text is `text#N`, reassembly segment arrays are `segs#N`
    segs_exchanges = 0
    for section in plan.split("\n(")[1:]:
        header = section.split("\n", 1)[0]
        if "Exchange" in header:
            assert "seg#" not in section, f"segment text in exchange: {section}"
            assert "text#" not in section, f"doc text in exchange: {section}"
            segs_exchanges += "segs#" in section
    assert segs_exchanges <= 1, (
        f"segment arrays cross {segs_exchanges} exchanges (max 1, the "
        f"doc-keyed reassembly join): {plan}"
    )


def test_min_cost_supplier_prunes_fact_by_region_first(spark, sf_dir):
    """Q2's region chain must collapse to a broadcast build side into the
    lineitem scan — every join broadcast, no SortMergeJoin anywhere."""
    plan = plan_of(QUERIES["sql_min_cost_supplier"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_image_dhash_band_join_is_broadcast(spark, sf_dir):
    """The band-mate count table is bounded at 2^16 rows regardless of
    corpus size, so the join back must be a broadcast — the hash stream
    cannot shuffle for it at 100 TB."""
    plan = plan_of(QUERIES["multimodal_image_dhash"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_discount_revenue_pushes_all_ranges(spark, sf_dir):
    """Q6's three range predicates must ALL reach the Parquet scan — the
    query is decided by row-group statistics at 100 TB."""
    plan = plan_of(QUERIES["sql_discount_revenue"](spark, sf_dir))
    for frag in (
        "GreaterThanOrEqual(l_shipdate",
        "LessThan(l_shipdate",
        "GreaterThanOrEqual(l_discount,0.04)",
        "LessThanOrEqual(l_discount,0.06)",
        "LessThan(l_quantity,24.0)",
    ):
        assert frag in plan, (frag, plan)


def test_returned_item_topk_uses_heap(spark, sf_dir):
    """Q10's top-20 must be TakeOrderedAndProject, never a global sort."""
    plan = plan_of(QUERIES["sql_returned_item_revenue"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_small_quantity_join_back_is_copartitioned(spark, sf_dir):
    """Q17's correlated average must cost ONE shuffle: the per-part
    aggregate output joins back on the key it is already partitioned by
    (no extra Exchange between the aggregate and the join)."""
    plan = plan_of(QUERIES["sql_small_quantity_revenue"](spark, sf_dir), mode="simple")
    # keyed shuffles: ONE per lineitem pass for the per-part aggregate plus
    # the countDistinct expansion's re-key — anything above 3 means the
    # correlated-average join re-shuffled a side it didn't need to.
    # (BroadcastExchange is excluded: at toy stats Spark broadcasts the
    # per-part aggregate; at scale AQE swaps it for the co-partitioned SMJ
    # on the same key without adding a keyed exchange.)
    assert plan.count("Exchange hashpartitioning") <= 3, plan
    assert "CartesianProduct" not in plan, plan


def test_incremental_dhash_is_equi_band_join(spark, sf_dir):
    """The incremental probe must be a hash equi-join on the band key —
    no cartesian/BNLJ pair formation, no sort-merge for a 2^16-bounded
    key domain."""
    plan = plan_of(QUERIES["dedup_incremental_dhash"](spark, sf_dir))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "hashpartitioning(nb" in plan or "BroadcastHashJoin" in plan, plan


def test_audio_vad_is_shuffle_free(spark, sf_dir):
    """VAD is one Arrow pass: any Exchange means the per-payload kernel
    picked up a shuffle it doesn't need."""
    plan = plan_of(QUERIES["multimodal_audio_vad"](spark, sf_dir), mode="simple")
    assert "Exchange" not in plan, plan


def test_ann_recall_curve_joins_are_broadcast(spark, sf_dir):
    """Everything after the one-pass exact ground truth must be broadcast
    joins (assignment lookup, cell-rank, nprobe/count scalars) — a shuffle
    join anywhere here would re-sort the corpus for 100-row lookup tables."""
    plan = plan_of(QUERIES["sim_ann_ivf_recall_curve"](spark, sf_dir))
    assert "SortMergeJoin" not in plan, plan


def test_bracketing_windows_have_no_unbounded_following_frame(spark, sf_dir):
    """r11 internals pin: resample_interpolate_linear and join_asof_nearest
    recover each row's NEXT observation with a reversed-order RUNNING
    frame, never a (CURRENT ROW, UNBOUNDED FOLLOWING) frame — Spark's
    UnboundedFollowingWindowFunctionFrame re-scans to the partition end
    for every row (O(rows²) per partition), which is exactly the frame a
    hot partition cannot afford at 100 TB. Value parity with the forward
    formulation is oracle-pinned (the DuckDB twins still use
    first_value OVER (... UNBOUNDED FOLLOWING))."""
    for qid in ("resample_interpolate_linear", "join_asof_nearest"):
        plan = plan_of(QUERIES[qid](spark, sf_dir))
        assert "unboundedfollowing" not in plan.lower(), qid


def test_emb_kmeans_assignment_is_shuffle_free(spark, sf_dir):
    """emb_kmeans_inertia's 100 TB claim: assignment never exchanges the
    corpus. The k centroids collapse to ONE broadcast array row and the
    per-vector argmax is a narrow array_min fold, so the plan must contain
    no Window and no hash exchange keyed on vec_id (the corpus key) — the
    only exchanges are the k-sized aggregation reduces on cell/(cell, pos),
    each behind a map-side partial aggregate."""
    plan = plan_of(QUERIES["emb_kmeans_inertia"](spark, sf_dir))
    assert "Window" not in plan, plan
    assert "hashpartitioning(vec_id" not in plan, plan
    for section in plan.split("\n(")[1:]:
        header = section.split("\n", 1)[0]
        if "Exchange" in header and "Broadcast" not in header:
            # SinglePartition exchanges here are the k-row centroid
            # collect (bounded by k, never the corpus)
            assert "cell" in section or "SinglePartition" in section, (
                f"non-cell-keyed corpus exchange: {section}"
            )


def test_ivf_adc_search_is_broadcast_probe_over_codes(spark, sf_dir):
    """IVF-ADC's 100 TB claim: probe-time work is the corpus-sized int8
    CODES table hash-equi-joined to broadcast probes/centroids/queries on
    the cell key — never sort-merge — and the float corpus embeddings must
    not ride any shuffle (the codes scan reads qv/scale, not embedding;
    reconstruction is a narrow zip_with after the broadcast joins). The
    only hashpartitioning Exchange is the final per-query candidate
    window, which carries reconstructed scores, not the corpus."""
    plan = plan_of(QUERIES["sim_ann_ivf_adc"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    # probe-time corpus scan is the persisted codes table, already
    # embedding-free (the 4x-smaller inverted file IS the scan)
    assert "ivf_adc_codes" in plan, plan
    for section in plan.split("\n(")[1:]:
        header = section.split("\n", 1)[0]
        if "Exchange hashpartitioning" in header:
            assert "embedding#" not in section, (
                f"float corpus vectors in a shuffle: {section}"
            )
