"""Cross-operator reconciliation (round 4): independent operators that
view the same facts must agree on the shared totals. The oracle gate
proves each query against its own SQL; these tests prove the queries
against EACH OTHER — the class of bug where two correct-looking reports
silently disagree because they count the same thing differently."""

from __future__ import annotations

from pyspark.sql import functions as F

from t20_database_etl_pipeline_assignment_spark.registry import QUERIES
from t20_database_etl_pipeline_assignment_spark.sources.tables import table


def test_attribution_totals_cover_every_purchase(spark, sf_dir):
    """Every purchase lands in exactly one attribution channel (incl. the
    -1 unattributed bucket), so channel counts sum to the purchase count."""
    out = QUERIES["attribution_last_touch"](spark, sf_dir).collect()
    n_purchases = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert sum(r.n_purchases for r in out) == n_purchases


def test_conversion_totals_cover_every_click(spark, sf_dir):
    """time_to_conversion partitions clicks by channel: click counts sum to
    the click count and conversions never exceed clicks per channel."""
    out = QUERIES["time_to_conversion"](spark, sf_dir).collect()
    n_clicks = (
        table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .count()
    )
    assert sum(r.n_clicks for r in out) == n_clicks
    for r in out:
        assert 0 <= r.n_converted <= r.n_clicks
        if r.n_converted == 0:
            assert r.sum_latency_us == 0 and r.max_latency_us is None


def test_lifecycle_states_partition_weekly_actives(spark, sf_dir):
    """Growth accounting: new + retained + resurrected exactly partitions
    each week's active users, and the new-user column telescopes to the
    total distinct user count."""
    e = table(spark, sf_dir, "events")
    weekly = (
        e.select("user_id", F.date_trunc("week", "ts").alias("w"))
        .distinct()
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    actives = {r.w: r.n_active for r in weekly.collect()}
    out = QUERIES["user_lifecycle_weekly"](spark, sf_dir).collect()
    got = {
        r.week: r.n_new + r.n_retained + r.n_resurrected
        for r in out
        if r.week in actives  # churn-only weeks have no active rows
    }
    assert got == actives
    n_users = e.select("user_id").distinct().count()
    assert sum(r.n_new for r in out) == n_users


def test_dau_never_exceeds_wau(spark, sf_dir):
    """A day's actives are a subset of its trailing week's actives."""
    for r in QUERIES["rolling_active_users"](spark, sf_dir).collect():
        assert 0 < r.dau <= r.wau
        assert 0 < r.stickiness <= 1.0


def test_session_conversion_reconciles_with_sessionize(spark, sf_dir):
    """The conversion curve and the sessionization rollup must agree on
    the session count per length and on the total event count (both are
    views over the same assign_session_seq kernel)."""
    conv = QUERIES["session_conversion_by_length"](spark, sf_dir).collect()
    sess = (
        QUERIES["sessionize_batch"](spark, sf_dir)
        .groupBy("n_events")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .collect()
    )
    assert {r.session_length: r.n_sessions for r in conv} == {
        r.n_events: r.n_sessions for r in sess
    }
    n_events = table(spark, sf_dir, "events").count()
    assert sum(r.session_length * r.n_sessions for r in conv) == n_events


def test_cdc_trajectory_ends_at_compacted_live_count(spark, sf_dir):
    """The per-day live-key trajectory's final value equals the number of
    live keys after compacting the whole log — the streaming sink's state
    and the batch compaction must land on the same count."""
    traj = sorted(
        QUERIES["stream_cdc_compaction"](spark, sf_dir).collect(),
        key=lambda r: r.day,
    )
    n_live = QUERIES["cdc_apply_log"](spark, sf_dir).count()
    assert traj[-1].n_live == n_live


def test_local_supplier_share_bounded_and_total_reconciles(spark, sf_dir):
    """Per nation the local share is a true fraction, and the nation totals
    sum to the whole lineitem revenue (every line item has exactly one
    customer nation)."""
    from t20_database_etl_pipeline_assignment_spark.exprs import scaled_long

    out = QUERIES["sql_local_supplier_share"](spark, sf_dir).collect()
    for r in out:
        assert 0.0 <= r.local_share <= 1.0
        assert r.local_revenue <= r.total_revenue
    revenue = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    whole = (
        table(spark, sf_dir, "lineitem")
        .agg(F.sum(scaled_long(revenue, 10000)).alias("s"))
        .collect()[0]["s"]
    )
    assert round(sum(r.total_revenue for r in out), 4) == round(whole / 10000.0, 4)


def test_top_supplier_is_argmax_of_share_inputs(spark, sf_dir):
    """sql_top_supplier_revenue's winners carry the maximum quarterly
    revenue, and every winner appears with identical revenue (ties kept)."""
    out = QUERIES["sql_top_supplier_revenue"](spark, sf_dir).collect()
    assert len(out) >= 1
    revs = {r.total_revenue for r in out}
    assert len(revs) == 1  # all winners tie at the max by construction


def test_scd4_current_face_is_merge_upsert(spark, sf_dir):
    """SCD Type 4's current face is by definition the Type-1 upsert of the
    same (target, staged) pair — the two operators must emit identical
    rows, and the history face must be a subset of the pre-merge target."""
    scd4 = QUERIES["scd4_apply"](spark, sf_dir)
    cur = {
        (r.c_custkey, r.c_name, r.c_acctbal)
        for r in scd4.filter(F.col("face") == "current").collect()
    }
    upsert = {
        (r.c_custkey, r.c_name, r.c_acctbal)
        for r in QUERIES["merge_upsert"](spark, sf_dir).collect()
    }
    assert cur == upsert
    hist = {
        (r.c_custkey, r.c_name, r.c_acctbal)
        for r in scd4.filter(F.col("face") == "history").collect()
    }
    tgt = {
        (r.c_custkey, r.c_name, r.c_acctbal)
        for r in table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .filter(F.col("c_custkey") % 2 == 0)
        .collect()
    }
    assert hist <= tgt


def test_table_diff_reconciles_with_scd4_history(spark, sf_dir):
    """table_diff_audit's 'changed' keys are exactly scd4's history keys
    (both defined as present-in-both with any attribute differing), and
    added + removed + changed partitions the symmetric difference."""
    diff = QUERIES["table_diff_audit"](spark, sf_dir).collect()
    by_type: dict[str, set] = {}
    for r in diff:
        by_type.setdefault(r.change_type, set()).add(r.c_custkey)
    hist_keys = {
        r.c_custkey
        for r in QUERIES["scd4_apply"](spark, sf_dir)
        .filter(F.col("face") == "history")
        .collect()
    }
    assert by_type.get("changed", set()) == hist_keys
    # added/removed/changed are disjoint by construction of the full outer join
    assert not (by_type.get("added", set()) & by_type.get("removed", set()))
    assert not (by_type.get("added", set()) & by_type.get("changed", set()))


def test_geo_grid_join_matches_brute_force(spark, sf_dir):
    """The grid-bucketed spatial join returns EXACTLY the pairs the naive
    all-pairs comparison finds — no duplicates (a pair could leak through
    two neighbor cells), no misses (a pair could straddle the 3x3
    envelope), every distance within the radius."""
    from t20_database_etl_pipeline_assignment_spark.operators.geo import _R_SQ

    out = QUERIES["geo_grid_distance_join"](spark, sf_dir).collect()
    pairs = [(r.user_a, r.user_b) for r in out]
    assert len(pairs) == len(set(pairs)), "duplicate pairs from cell overlap"
    for r in out:
        assert r.user_a < r.user_b and 0 <= r.dist_sq <= _R_SQ

    from t20_database_etl_pipeline_assignment_spark.operators.llm import hash60

    pts = (
        table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select("user_id", hash60(F.col("user_id").cast("string")).alias("h"))
        .selectExpr("user_id", "h % 180000 AS lat", "(h DIV 180000) % 360000 AS lon")
    )
    a = pts.toDF("ua", "lata", "lona")
    b = pts.toDF("ub", "latb", "lonb")
    brute = (
        a.crossJoin(b)
        .filter(
            (F.col("ua") < F.col("ub"))
            & (
                (F.col("lata") - F.col("latb")) * (F.col("lata") - F.col("latb"))
                + (F.col("lona") - F.col("lonb")) * (F.col("lona") - F.col("lonb"))
                <= F.lit(_R_SQ)
            )
        )
        .collect()
    )
    assert set(pairs) == {(r.ua, r.ub) for r in brute}


def test_count_min_sketch_never_undercounts(spark, sf_dir):
    """The CMS structural guarantee: every estimate >= the true count
    (min over d counters can only overcount via collisions), and the
    overcount column is exactly the difference."""
    out = QUERIES["agg_count_min_sketch"](spark, sf_dir).collect()
    assert out, "sketch query returned nothing"
    for r in out:
        assert r.n_est >= r.n_true > 0
        assert r.overcount == r.n_est - r.n_true


def test_surprisal_is_internally_consistent(spark, sf_dir):
    """surprisal_milli must be the exact integer mean of sum_bits, and a
    doc's mean surprisal can never exceed the corpus-size ceiling
    (every token's bits <= floor(log2 N))."""
    out = QUERIES["text_surprisal_score"](spark, sf_dir).collect()
    n_total = sum(r.n_tokens for r in out)
    ceiling_bits = n_total.bit_length() - 1
    for r in out:
        assert r.surprisal_milli == (1000 * r.sum_bits) // r.n_tokens
        assert 0 <= r.sum_bits <= r.n_tokens * ceiling_bits


def test_sole_blame_matches_literal_exists_form(spark, sf_dir):
    """The decorrelated Q21 plan (one per-order aggregate) returns the
    same rows as the literal correlated EXISTS / NOT EXISTS SQL run on
    Spark itself — proving the rewrite, not just oracle parity."""
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("v_li")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("v_s")
    literal = spark.sql(
        """
        SELECT s.s_suppkey, s.s_name, COUNT(*) AS numwait
        FROM v_s s
        JOIN (SELECT DISTINCT l_orderkey, l_suppkey FROM v_li
              WHERE l_returnflag = 'R') l1
          ON l1.l_suppkey = s.s_suppkey
        WHERE EXISTS (SELECT 1 FROM v_li l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM v_li l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_returnflag = 'R')
        GROUP BY s.s_suppkey, s.s_name
        """
    ).collect()
    out = QUERIES["sql_sole_blame_supplier"](spark, sf_dir).collect()
    key = lambda r: (r.s_suppkey, r.s_name, r.numwait)  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, literal))


def test_dominant_supplier_dominance_invariant(spark, sf_dir):
    """Every reported supplier genuinely dominates: more than half the
    part's recent volume, and never more than the whole."""
    out = QUERIES["sql_dominant_part_supplier"](spark, sf_dir).collect()
    assert out, "no dominant suppliers found"
    for r in out:
        assert r.supp_qty * 2 > r.part_qty
        assert r.supp_qty <= r.part_qty


def test_order_count_distribution_covers_every_customer(spark, sf_dir):
    """Q13's histogram is a partition of the customer set: bucket counts sum
    to the customer count, and order-weighted buckets sum to the qualifying
    (non-'F') order count — zero-order customers land in the 0 bucket."""
    out = QUERIES["sql_order_count_distribution"](spark, sf_dir).collect()
    n_cust = table(spark, sf_dir, "customer").count()
    n_open = (
        table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F").count()
    )
    assert sum(r.custdist for r in out) == n_cust
    assert sum(r.n_orders * r.custdist for r in out) == n_open
    assert any(r.n_orders == 0 for r in out)  # the LEFT-JOIN bucket is live


def test_large_volume_matches_literal_window_form(spark, sf_dir):
    """Q18 re-derived through a window formulation (per-order running total
    over lineitem) must select the identical order set with identical
    totals."""
    from pyspark.sql import Window

    out = {
        r.o_orderkey: r.total_qty
        for r in QUERIES["sql_large_volume_customer"](spark, sf_dir).collect()
    }
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("long").alias("qc"),
    )
    w = Window.partitionBy("l_orderkey")
    lit = (
        li.withColumn("tot", F.sum("qc").over(w))
        .filter(F.col("tot") > 25000)
        .select("l_orderkey", "tot")
        .distinct()
        .collect()
    )
    assert out == {r.l_orderkey: r.tot / 100.0 for r in lit}


def test_value_share_threshold_scalar_reconciles(spark, sf_dir):
    """Q11's survivors are exactly the parts above 1.5x the mean part value,
    re-derived independently in exact scaled integers."""
    out = {r.l_partkey for r in QUERIES["sql_value_share_threshold"](spark, sf_dir).collect()}
    pv = (
        table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    + F.lit(0.5)
                ).cast("long")
            ).alias("v")
        )
        .collect()
    )
    tot = sum(r.v for r in pv)
    want = {r.l_partkey for r in pv if r.v * 2 * len(pv) > 3 * tot}
    assert out == want and len(want) > 0


def test_supplier_cnt_reconciles_with_bruteforce(spark, sf_dir):
    """Q16 re-derived in driver-side Python over the raw tables: identical
    (brand, type, size) -> distinct-eligible-supplier counts."""
    from collections import defaultdict

    out = {
        (r.p_brand, r.p_type, r.p_size): r.supplier_cnt
        for r in QUERIES["sql_supplier_cnt_by_parttype"](spark, sf_dir).collect()
    }
    sup = table(spark, sf_dir, "supplier").select("s_suppkey", "s_acctbal").collect()
    cents = {r.s_suppkey: int(r.s_acctbal * 100 + 0.5) for r in sup}
    tot = sum(cents.values())
    excl = {k for k, c in cents.items() if c * len(cents) < tot}
    parts = {
        r.p_partkey: (r.p_brand, r.p_type, r.p_size)
        for r in table(spark, sf_dir, "part")
        .filter((F.col("p_brand") != "Brand#1") & F.col("p_size").isin(10, 20, 30, 40, 50))
        .collect()
    }
    pairs = (
        table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct().collect()
    )
    want = defaultdict(set)
    for r in pairs:
        if r.l_partkey in parts and r.l_suppkey not in excl:
            want[parts[r.l_partkey]].add(r.l_suppkey)
    assert out == {k: len(v) for k, v in want.items()}


def test_min_cost_supplier_reconciles_with_bruteforce(spark, sf_dir):
    """Q2 re-derived driver-side: for each small part, the EUROPE suppliers
    achieving the regional minimum unit cost — all ties, no extras."""
    from collections import defaultdict

    out = defaultdict(set)
    costs = {}
    for r in QUERIES["sql_min_cost_supplier"](spark, sf_dir).collect():
        out[r.p_partkey].add(r.s_name)
        costs[r.p_partkey] = r.unit_cost
    nat = {r.n_nationkey: r.n_regionkey for r in table(spark, sf_dir, "nation").collect()}
    eu = {r.r_regionkey for r in table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").collect()}
    sup = {
        r.s_suppkey: r.s_name
        for r in table(spark, sf_dir, "supplier").collect()
        if nat[r.s_nationkey] in eu
    }
    small = {r.p_partkey for r in table(spark, sf_dir, "part").filter(F.col("p_size") <= 10).collect()}
    best: dict = {}
    for r in table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity").collect():
        if r.l_suppkey not in sup or r.l_partkey not in small:
            continue
        u = r.l_extendedprice / r.l_quantity
        cur = best.setdefault(r.l_partkey, {})
        cur[r.l_suppkey] = min(cur.get(r.l_suppkey, u), u)
    want = {}
    for pk, by_supp in best.items():
        m = min(by_supp.values())
        want[pk] = {sup[sk] for sk, u in by_supp.items() if u == m}
        assert costs[pk] == m
    assert dict(out) == want and len(want) > 0


def test_discount_revenue_reconciles_with_bruteforce(spark, sf_dir):
    """Q6 re-derived driver-side in exact scaled integers."""
    out = QUERIES["sql_discount_revenue"](spark, sf_dir).collect()[0]
    rows = (
        table(spark, sf_dir, "lineitem")
        .select("l_shipdate", "l_discount", "l_quantity", "l_extendedprice")
        .collect()
    )
    import datetime

    lo, hi = datetime.datetime(1997, 1, 1), datetime.datetime(1998, 1, 1)
    hit = [
        r for r in rows
        if lo <= r.l_shipdate < hi and 0.04 <= r.l_discount <= 0.06 and r.l_quantity < 24
    ]
    want = sum(int(r.l_extendedprice * r.l_discount * 10000 + 0.5) for r in hit)
    assert out.n_lines == len(hit)
    assert out.discount_revenue == want / 10000.0


def test_market_share_and_promo_share_invariants(spark, sf_dir):
    """Q8/Q14 shares: numerator never exceeds denominator, milli-shares in
    [0, 1000], and the exact DIV is consistent with the displayed sums."""
    for qid, num, den, milli in [
        ("sql_nation_market_share", "nation_rev", "total_rev", "share_milli"),
        ("sql_promo_revenue_share", "promo_rev", "total_rev", "promo_milli"),
    ]:
        rows = QUERIES[qid](spark, sf_dir).collect()
        assert rows, qid
        for r in rows:
            n, d, m = r[num], r[den], r[milli]
            assert 0 <= n <= d, (qid, r)
            assert 0 <= m <= 1000, (qid, r)
            # milli is the floor of the exact ratio; reconstruct in cents
            assert m == (1000 * round(n * 100)) // round(d * 100), (qid, r)


def test_returned_item_revenue_topk_is_correct_cut(spark, sf_dir):
    """Q10's top-20 re-derived from the unlimited aggregate: the same
    (revenue DESC, custkey ASC) prefix."""
    got = [
        (r.c_custkey, r.revenue)
        for r in QUERIES["sql_returned_item_revenue"](spark, sf_dir).collect()
    ]
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp"))
    )
    per = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    + F.lit(0.5)
                ).cast("long")
            ).alias("rev_s")
        )
        .collect()
    )
    want = sorted(
        ((r.o_custkey, r.rev_s / 10000.0) for r in per),
        key=lambda kv: (-kv[1], kv[0]),
    )[:20]
    assert got == want


def test_shipmode_priority_counts_partition_late_lines(spark, sf_dir):
    """Q12: high+low counts must equal the late-line total per status."""
    out = QUERIES["sql_shipmode_priority_count"](spark, sf_dir).collect()
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    late = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.expr("timestampadd(DAY, 90, o_orderdate)"))
        .groupBy("l_linestatus")
        .count()
        .collect()
    )
    want = {r.l_linestatus: r["count"] for r in late}
    assert {r.l_linestatus: r.high_line_count + r.low_line_count for r in out} == want


def test_small_quantity_revenue_reconciles_with_bruteforce(spark, sf_dir):
    """Q17 re-derived driver-side: identical qualifying-line set under the
    exact integer 0.2x-average test."""
    from collections import defaultdict

    out = QUERIES["sql_small_quantity_revenue"](spark, sf_dir).collect()[0]
    brand = {
        r.p_partkey
        for r in table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").collect()
    }
    rows = (
        table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .collect()
    )
    stats = defaultdict(lambda: [0, 0])
    for r in rows:
        s = stats[r.l_partkey]
        s[0] += 1
        s[1] += int(r.l_quantity * 100 + 0.5)
    hit = [
        r for r in rows
        if r.l_partkey in brand
        and int(r.l_quantity * 100 + 0.5) * 5 * stats[r.l_partkey][0] < stats[r.l_partkey][1]
    ]
    assert out.n_lines == len(hit)
    assert out.n_parts == len({r.l_partkey for r in hit})
    want = sum(int(r.l_extendedprice * 100 + 0.5) for r in hit)
    assert out.small_qty_revenue == want / 100.0
