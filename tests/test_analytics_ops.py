"""Semantic invariants for the round-3 analytics operators
(operators/analytics.py). Oracle parity (tests/test_oracle_parity.py) proves
bit-equality with DuckDB; these tests pin the *meaning* against brute-force
Python models on the fixture output and on adversarial synthetic inputs.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from t20_database_etl_pipeline_assignment_spark.registry import QUERIES

_NEW = [
    "sessionize_batch",
    "win_ewma",
    "skyline_pareto",
    "agg_corr_matrix",
    "profile_columns",
    "text_gini_concentration",
    "anomaly_mad",
    "agg_weighted_median",
    "event_path_topk",
    "zorder_cluster_audit",
]


def test_sessionize_partitions_events_exactly(spark, sf_dir):
    """Sessions partition the event log: per-user session event counts sum
    to the user's event count, sessions are disjoint in time, and every
    intra-session duration is consistent with start/end."""
    sess = QUERIES["sessionize_batch"](spark, sf_dir)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    per_user_sessions = (
        sess.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()
    )
    per_user_events = dict(
        (r.user_id, r.n)
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    assert per_user_sessions
    for r in per_user_sessions:
        assert r.n == per_user_events[r.user_id]
    for r in sess.collect():
        assert r.end_us - r.start_us == r.duration_us
        assert r.duration_us >= 0 and r.n_events >= 1


def test_sessionize_gap_boundaries(spark, sf_dir):
    """Consecutive sessions of the same user are separated by > the 30-min
    gap (otherwise they would have been one session)."""
    rows = (
        QUERIES["sessionize_batch"](spark, sf_dir)
        .orderBy("user_id", "session_seq")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    checked = 0
    for sess in by_user.values():
        for a, b in zip(sess, sess[1:]):
            assert b.session_seq == a.session_seq + 1
            assert b.start_us - a.end_us > 1_800_000_000
            checked += 1
    assert checked > 0


def test_ewma_matches_python_model(spark, sf_dir):
    """EWMA equals the truncated renormalized model computed in Python over
    the same per-user order."""
    out = {
        r.event_id: r.ewma
        for r in QUERIES["win_ewma"](spark, sf_dir).collect()
    }
    ev = sorted(
        QUERIES["win_ewma"](spark, sf_dir)
        .select("user_id", "event_id", "us", "value")
        .collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    weights = [1.0, 0.5, 0.25, 0.125, 0.0625]
    hist: dict[int, list[float]] = {}
    for r in ev:
        h = hist.setdefault(r.user_id, [])
        h.append(r.value)
        window = h[-5:][::-1]  # most recent first
        num = sum(v * w for v, w in zip(window, weights))
        den = sum(w for _, w in zip(window, weights))
        assert abs(out[r.event_id] - num / den) < 1e-9


def test_skyline_is_exactly_the_pareto_frontier(spark, sf_dir):
    """Survivors = the brute-force strict-dominance frontier per brand."""
    part = spark.read.parquet(f"{sf_dir}/part.parquet").collect()
    by_brand: dict[str, list] = {}
    for p in part:
        by_brand.setdefault(p.p_brand, []).append(p)
    expected = set()
    for brand, ps in by_brand.items():
        for p in ps:
            pc = round(p.p_retailprice * 100)
            dominated = any(
                round(q.p_retailprice * 100) < pc and q.p_size > p.p_size
                for q in ps
            )
            if not dominated:
                expected.add(p.p_partkey)
    got = {r.p_partkey for r in QUERIES["skyline_pareto"](spark, sf_dir).collect()}
    assert got == expected


def test_corr_matrix_matches_numpy(spark, sf_dir):
    import numpy as np

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_quantity", "l_extendedprice", "l_discount"
    )
    arr = np.array([[r[0], r[1], r[2]] for r in li.collect()])
    c = np.corrcoef(arr.T)
    row = QUERIES["agg_corr_matrix"](spark, sf_dir).collect()[0]
    assert abs(row.corr_qty_price - c[0, 1]) < 1e-6
    assert abs(row.corr_qty_disc - c[0, 2]) < 1e-6
    assert abs(row.corr_price_disc - c[1, 2]) < 1e-6
    assert row.n == arr.shape[0]


def test_profile_columns_against_duckdb_free_model(spark, sf_dir):
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    rows = {r.col_name: r for r in QUERIES["profile_columns"](spark, sf_dir).collect()}
    assert set(rows) == {
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_acctbal_cents",
        "c_mktsegment",
    }
    n = cust.count()
    for r in rows.values():
        assert r.n_rows == n
        assert r.n_nulls == 0  # fixtures carry no nulls in these columns
        assert 1 <= r.n_distinct <= n
        assert r.min_val is not None and r.max_val is not None
    assert rows["c_custkey"].n_distinct == n  # PK
    assert int(rows["c_custkey"].min_val) == 0  # fixture keys are 0-based


def test_gini_bounds_and_extremes(spark, sf_dir):
    """0 ≤ gini < 1; all-distinct docs hit exactly 1 − 1/n; and the score is
    monotone with diversity on a hand-built pair."""
    rows = QUERIES["text_gini_concentration"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.gini < 1.0
        if r.n_distinct_words == r.n_words:
            assert abs(r.gini - (1.0 - 1.0 / r.n_words)) < 1e-12
        if r.n_distinct_words == 1:
            assert r.gini == 0.0


def test_anomaly_mad_python_model(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "event_id", "value"
    )
    data: dict[str, list[tuple[int, int]]] = {}
    for r in ev.collect():
        data.setdefault(r.event_type, []).append(
            (int(r.value * 100 + 0.5), r.event_id)
        )

    def lower_median(pairs):
        s = sorted(pairs)
        return s[(len(s) + 1) // 2 - 1][0]

    out = {r.event_type: r for r in QUERIES["anomaly_mad"](spark, sf_dir).collect()}
    assert set(out) == set(data)
    for et, vals in data.items():
        med = lower_median(vals)
        devs = [(abs(v - med), eid) for v, eid in vals]
        mad = lower_median(devs)
        n_out = sum(1 for d, _ in devs if d > 3 * mad)
        assert out[et].n == len(vals)
        assert abs(out[et].median_value - med / 100.0) < 1e-9
        assert abs(out[et].mad_value - mad / 100.0) < 1e-9
        assert out[et].n_outliers == n_out


def test_weighted_median_python_model(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_returnflag", "l_extendedprice", "l_quantity", "l_orderkey", "l_linenumber"
    )
    groups: dict[str, list[tuple[int, int, int, int]]] = {}
    for r in li.collect():
        groups.setdefault(r.l_returnflag, []).append(
            (
                int(r.l_extendedprice * 100 + 0.5),
                r.l_orderkey,
                r.l_linenumber,
                int(r.l_quantity * 100 + 0.5),
            )
        )
    out = {
        r.l_returnflag: r
        for r in QUERIES["agg_weighted_median"](spark, sf_dir).collect()
    }
    for flag, rows in groups.items():
        rows.sort()
        tot = sum(w for *_, w in rows)
        cum = 0
        ans = None
        for price, _, _, w in rows:
            cum += w
            if 2 * cum >= tot:
                ans = price
                break
        assert abs(out[flag].weighted_median_price - ans / 100.0) < 1e-9
        assert abs(out[flag].total_weight - tot / 100.0) < 1e-9


def test_event_path_topk_counts(spark, sf_dir):
    """Top-10 paths match a brute-force recount, including the
    lexicographic tie-break at the cut."""
    ev = sorted(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    paths: Counter = Counter()
    prev: dict[int, list[str]] = {}
    for r in ev:
        h = prev.setdefault(r.user_id, [])
        h.append(r.event_type)
        if len(h) >= 3:
            paths[">".join(h[-3:])] += 1
    expected = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [
        (r.path, r.n_occurrences)
        for r in QUERIES["event_path_topk"](spark, sf_dir).collect()
    ]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == expected


def test_zorder_buckets_are_prefix_ordered_envelopes(spark, sf_dir):
    """Every row lands in a bucket; 16 possible buckets; each bucket's
    envelope is consistent (min ≤ max) and the bucket id equals the Morton
    prefix of its corners' interleave — i.e. buckets really are contiguous
    Z-ranges, the property that makes min/max file stats prunable on BOTH
    dimensions."""
    rows = QUERIES["zorder_cluster_audit"](spark, sf_dir).collect()
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert sum(r.n_rows for r in rows) == n_orders
    assert all(0 <= r.z_bucket < 16 for r in rows)

    def morton(x: int, y: int) -> int:
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    for r in rows:
        assert r.min_x <= r.max_x and r.min_y <= r.max_y
        assert 0 <= r.min_x and r.max_x <= 65535
        assert 0 <= r.min_y and r.max_y <= 65535
        # the bucket's 2-bit-per-dimension prefix recovers the top bits of
        # both dimensions: every x,y in the envelope shares them
        for x, y in [(r.min_x, r.min_y), (r.max_x, r.max_y)]:
            assert morton(x, y) >> 28 == r.z_bucket


def test_all_new_ops_registered_with_oracles():
    from t20_database_etl_pipeline_assignment_spark.registry import ORACLES

    for q in _NEW:
        assert q in QUERIES and q in ORACLES


# ---- round-3 batch 2 -------------------------------------------------------


def test_rfm_scores_valid_and_monotone(spark, sf_dir):
    """Scores are 1..5; within a segment, a strictly better raw metric never
    gets a strictly worse score; every customer with orders is scored."""
    rows = QUERIES["rfm_segmentation"](spark, sf_dir).collect()
    assert rows
    by_seg: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
        assert r.r_days >= 0
        by_seg.setdefault(r.segment, []).append(r)
    for seg_rows in by_seg.values():
        for metric, score, better_is_smaller in [
            ("r_days", "r_score", True),
            ("f_orders", "f_score", False),
            ("m_total", "m_score", False),
        ]:
            s = sorted(
                seg_rows,
                key=lambda r: getattr(r, metric),
                reverse=not better_is_smaller,
            )
            for a, b in zip(s, s[1:]):
                if getattr(a, metric) != getattr(b, metric):
                    assert getattr(a, score) >= getattr(b, score)


def test_rfm_quintiles_balanced(spark, sf_dir):
    """Rank-based scoring makes quintiles balanced to within one customer
    per segment."""
    rows = QUERIES["rfm_segmentation"](spark, sf_dir).collect()
    by_seg: dict[str, list] = {}
    for r in rows:
        by_seg.setdefault(r.segment, []).append(r)
    for seg_rows in by_seg.values():
        n = len(seg_rows)
        if n < 10:
            continue
        counts = Counter(r.r_score for r in seg_rows)
        assert max(counts.values()) - min(counts.values()) <= 1


def test_twa_constant_series_and_simple_case(spark, sf_dir):
    """TWA of the fixture matches a brute-force trapezoid in Python."""
    ev = sorted(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    series: dict[int, list[tuple[int, int]]] = {}
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000) if hasattr(r.ts, "timestamp") else 0
        series.setdefault(r.user_id, []).append((us, int(r.value * 100 + 0.5)))
    out = {r.user_id: r for r in QUERIES["time_weighted_avg"](spark, sf_dir).collect()}
    for uid, pts in series.items():
        span = pts[-1][0] - pts[0][0]
        if span == 0:
            expect = sum(v for _, v in pts) / (100.0 * len(pts))
        else:
            wsum = sum(
                (va + vb) * (tb - ta)
                for (ta, va), (tb, vb) in zip(pts, pts[1:])
            )
            expect = wsum / (2.0 * 100.0 * span)
        assert abs(out[uid].twa_value - expect) < 1e-6
        assert out[uid].n_events == len(pts)


def test_rolling_median_window_model(spark, sf_dir):
    rows = sorted(
        QUERIES["win_rolling_median"](spark, sf_dir).collect(),
        key=lambda r: (r.user_id, r.us, r.event_id),
    )
    ev = sorted(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    hist: dict[int, list[int]] = {}
    expected: dict[int, float] = {}
    for r in ev:
        h = hist.setdefault(r.user_id, [])
        h.append(int(r.value * 100 + 0.5))
        lst = sorted(h[-7:])
        expected[r.event_id] = lst[(len(lst) + 1) // 2 - 1] / 100.0
    for r in rows:
        assert abs(r.rolling_median - expected[r.event_id]) < 1e-9


def test_freshness_lag_consistency(spark, sf_dir):
    rows = QUERIES["dq_freshness_lag"](spark, sf_dir).collect()
    assert len(rows) == 5  # five event types in the fixtures
    for r in rows:
        assert r.lag_us == 1_706_659_200_000_000 - r.max_us
        assert r.stale == (r.lag_us > 86_400_000_000)
        assert r.n_events > 0


# ---- round-3 batch 3 (llm.py / etl.py additions) ---------------------------


def test_containment_planted_snippets_found(spark, sf_dir):
    """Every planted prefix snippet with enough shingles is reported
    contained in its parent with containment 1.0; containment is in
    (0, 1]."""
    rows = QUERIES["dedup_containment"](spark, sf_dir).collect()
    assert rows
    pairs = {(r.snippet_id, r.container_id): r.containment for r in rows}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    planted_found = sum(
        1
        for (s, c), v in pairs.items()
        if s - 2000000 == c and abs(v - 1.0) < 1e-9
    )
    # nearly all of the ~n/7 planted snippets must surface as exact
    # containment in their own parent (tiny docs may yield <2 shingles)
    assert planted_found >= (n_docs // 7) * 9 // 10
    for v in pairs.values():
        assert 0.9 <= v <= 1.0


def test_ivm_delta_identity_against_full_recompute(spark, sf_dir):
    """The three-term delta equals full view minus old view (multiset),
    recomputed independently with Spark itself."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    wm = F.lit("1999-01-01 00:00:00").cast("timestamp_ntz")
    full = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey")
    old = (
        o.filter(F.col("o_orderdate") < wm)
        .join(
            c.filter(F.col("c_custkey") % 20 != 0),
            o.o_custkey == c.c_custkey,
        )
        .select("o_orderkey")
    )
    expected = full.exceptAll(old).count()
    got = QUERIES["ivm_join_delta"](spark, sf_dir).count()
    assert got == expected
    # delta terms are disjoint: no duplicated (orderkey, custkey) pairs
    df = QUERIES["ivm_join_delta"](spark, sf_dir)
    assert df.count() == df.select("o_orderkey", "o_custkey").distinct().count()


# ---- round-3 batch 4 -------------------------------------------------------


def test_cusum_matches_sequential_model(spark, sf_dir):
    """The window formulation equals the textbook sequential recursion
    S_i = max(0, S_{i-1} + x_i - mu - k)."""
    ev = sorted(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_type", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.event_type, r.ts, r.event_id),
    )
    by_type: dict[str, list] = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append(r)
    out = {
        (r.event_type, r.event_id): r
        for r in QUERIES["win_cusum_drift"](spark, sf_dir).collect()
    }
    for et, rows in by_type.items():
        vals = [int(r.value * 100 + 0.5) for r in rows]
        mu = sum(vals) // len(vals)
        s = 0
        for r, v in zip(rows, vals):
            s = max(0, s + v - mu - 2500)
            got = out[(et, r.event_id)]
            assert abs(got.cusum - s / 100.0) < 1e-9
            assert got.alarm == (s > 20000)


def test_bollinger_bands_model(spark, sf_dir):
    import math

    ev = sorted(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    hist: dict[int, list[int]] = {}
    out = {
        r.event_id: r
        for r in QUERIES["win_bollinger_bands"](spark, sf_dir).collect()
    }
    for r in ev:
        h = hist.setdefault(r.user_id, [])
        h.append(int(r.value * 100 + 0.5))
        frame = h[-10:]
        n = len(frame)
        sma = sum(frame) / (100.0 * n)
        got = out[r.event_id]
        assert abs(got.sma - sma) < 1e-9
        if n > 1:
            var = (n * sum(v * v for v in frame) - sum(frame) ** 2) / (
                n * n * (n - 1)
            )
            sd = math.sqrt(var) / 100.0
            assert abs(got.upper_band - (sma + 2 * sd)) < 1e-9
            assert abs(got.lower_band - (sma - 2 * sd)) < 1e-9
            assert got.lower_band <= got.sma <= got.upper_band
        else:
            assert got.upper_band is None and got.lower_band is None


def test_drawdown_model(spark, sf_dir):
    ev = sorted(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    series: dict[int, list[int]] = {}
    for r in ev:
        series.setdefault(r.user_id, []).append(int(r.value * 100 + 0.5))
    out = {r.user_id: r for r in QUERIES["win_drawdown"](spark, sf_dir).collect()}
    for uid, vals in series.items():
        eq = 0
        peak = -(10**18)
        mdd = 0
        for v in vals:
            eq += v
            peak = max(peak, eq)
            mdd = max(mdd, peak - eq)
        assert abs(out[uid].max_drawdown - mdd / 100.0) < 1e-9
        assert abs(out[uid].peak_equity - peak / 100.0) < 1e-9
        assert out[uid].n_events == len(vals)
        assert out[uid].max_drawdown >= 0.0


def test_seasonality_profile_consistency(spark, sf_dir):
    rows = QUERIES["seasonality_weekday_profile"](spark, sf_dir).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        assert 0 <= r.weekday <= 6
        by_type.setdefault(r.event_type, []).append(r)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    totals = {
        r.event_type: r.n
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for et, rs in by_type.items():
        assert sum(r.n_events for r in rs) == totals[et]
        # deviations are centred: weighted sum over weekdays ≈ 0
        wsum = sum(r.deviation_from_mean * r.n_events for r in rs)
        assert abs(wsum) < 1e-6 * totals[et]


# ---- round-3 batch 5 -------------------------------------------------------


def test_market_basket_model(spark, sf_dir):
    """Support/confidence/lift match a brute-force recount over baskets."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict[int, set] = {}
    for r in li:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    n_orders = len(baskets)
    freq: Counter = Counter()
    pair_c: Counter = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        freq.update(ps)
        for i, p1 in enumerate(ps):
            for p2 in ps[i + 1 :]:
                pair_c[(p1, p2)] += 1
    expected = {k: v for k, v in pair_c.items() if v >= 2}
    rows = QUERIES["market_basket_pairs"](spark, sf_dir).collect()
    assert {(r.pk1, r.pk2): r.c_ab for r in rows} == expected
    for r in rows:
        assert abs(r.support - r.c_ab / n_orders) < 1e-12
        assert abs(r.confidence - r.c_ab / freq[r.pk1]) < 1e-12
        assert (
            abs(r.lift - r.c_ab * n_orders / (freq[r.pk1] * freq[r.pk2])) < 1e-9
        )
        assert r.pk1 < r.pk2


def test_interpolation_model_and_bounds(spark, sf_dir):
    """Interpolated values are convex combinations of the bracketing
    observations; grid points at an exact observation reproduce it; points
    outside the observed range are NULL."""
    ev = sorted(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts),
    )
    series: dict[int, list[tuple[int, int]]] = {}
    for r in ev:
        us = int(r.ts.timestamp() * 1_000_000)
        series.setdefault(r.user_id, []).append((us, int(r.value * 100 + 0.5)))
    import bisect

    rows = QUERIES["resample_interpolate_linear"](spark, sf_dir).collect()
    assert rows
    n_null = 0
    for r in rows:
        pts = series[r.user_id]
        uss = [u for u, _ in pts]
        if r.grid_us < uss[0] or r.grid_us > uss[-1]:
            assert r.value_interp is None
            n_null += 1
            continue
        i = bisect.bisect_right(uss, r.grid_us)
        # prev = last obs with us <= grid (ties: the latest one)
        pu, pv = pts[i - 1]
        if pu == r.grid_us:
            # grid at an exact observation time reproduces the LAST
            # observation at that instant (sort order puts obs first)
            nxt = pts[i] if i < len(pts) else None
            if nxt is None:
                assert r.value_interp is None
                n_null += 1
                continue
            nu, nv = nxt
            expect = (pv * (nu - pu) + nv * 0) / ((nu - pu) * 100.0)
            assert abs(r.value_interp - expect) < 1e-9
        else:
            assert i < len(pts)
            nu, nv = pts[i]
            expect = (pv * (nu - r.grid_us) + nv * (r.grid_us - pu)) / (
                (nu - pu) * 100.0
            )
            assert abs(r.value_interp - expect) < 1e-9
            lo, hi = min(pv, nv) / 100.0, max(pv, nv) / 100.0
            assert lo - 1e-9 <= r.value_interp <= hi + 1e-9
    assert n_null < len(rows)  # interior points dominate


def test_burst_detection_model(spark, sf_dir):
    rows = QUERIES["event_burst_detection"](spark, sf_dir).collect()
    assert rows
    import math

    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        cnts = [r.cnt for r in rs]
        n = len(cnts)
        mu = sum(cnts) / n
        var = sum((c - mu) ** 2 for c in cnts) / (n - 1)
        sd = math.sqrt(var)
        for r in rs:
            assert r.burst == (r.cnt > mu + 3 * sd), (et, r.hour_bucket)
            assert r.excess_n_scaled == n * r.cnt - sum(cnts)


# ---- scale-tier variants (the implemented 100 TB swaps) --------------------


def test_profile_columns_approx_close_to_exact(spark, sf_dir):
    from t20_database_etl_pipeline_assignment_spark.operators.analytics import (
        profile_columns_approx,
    )
    from t20_database_etl_pipeline_assignment_spark.exprs import scaled_long as sl
    from t20_database_etl_pipeline_assignment_spark.plans.lint import lint

    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        "c_mktsegment",
        sl(F.col("c_acctbal"), 100).alias("c_acctbal_cents"),
    )
    cols = ["c_custkey", "c_name", "c_nationkey", "c_acctbal_cents", "c_mktsegment"]
    approx = {
        r.col_name: r for r in profile_columns_approx(cust, cols).collect()
    }
    exact = {r.col_name: r for r in QUERIES["profile_columns"](spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for name, e in exact.items():
        a = approx[name]
        assert a.n_rows == e.n_rows and a.n_nulls == e.n_nulls
        assert a.min_val == e.min_val and a.max_val == e.max_val
        # HLL++ rsd 5% default; allow 3x margin
        assert abs(a.n_distinct - e.n_distinct) <= max(2, 0.15 * e.n_distinct)
    # the scale property itself: no Expand operator in the approx plan
    plan = profile_columns_approx(cust, cols)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    exact_plan = (
        QUERIES["profile_columns"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in exact_plan  # the cost the swap removes
    assert lint(profile_columns_approx(cust, cols)) == []


def test_rfm_cutoff_scores_agree_with_rank_scores(spark, sf_dir):
    from t20_database_etl_pipeline_assignment_spark.operators.analytics import (
        rfm_score_by_cutoffs,
        rfm_user_metrics,
    )

    u = rfm_user_metrics(spark, sf_dir)
    cutoffs = {}
    for col in ["r_days", "f_orders", "m_total"]:
        qs = u.agg(
            F.percentile_approx(col, [0.2, 0.4, 0.6, 0.8], 10000).alias("q")
        ).collect()[0].q
        cutoffs[col] = list(qs)
    mapped = {
        r.custkey: r for r in rfm_score_by_cutoffs(u, cutoffs).collect()
    }
    exact = {r.custkey: r for r in QUERIES["rfm_segmentation"](spark, sf_dir).collect()}
    assert set(mapped) == set(exact)
    # global-quantile cutoff scores vs per-segment rank scores: must agree
    # within 1 quintile for the vast majority (they differ only by segment
    # skew and approx-quantile error)
    for metric in ["r_score", "f_score", "m_score"]:
        close = sum(
            1
            for k in exact
            if abs(getattr(mapped[k], metric) - getattr(exact[k], metric)) <= 1
        )
        assert close >= 0.9 * len(exact), metric


def test_mad_approx_close_to_exact(spark, sf_dir):
    from t20_database_etl_pipeline_assignment_spark.operators.analytics import (
        mad_summary_approx,
    )
    from t20_database_etl_pipeline_assignment_spark.exprs import epoch_us, scaled_long as sl
    from t20_database_etl_pipeline_assignment_spark.sources.tables import table as tbl

    e = tbl(spark, sf_dir, "events").select(
        "event_type", "event_id", sl(F.col("value"), 100).alias("v_c")
    )
    approx = {r.event_type: r for r in mad_summary_approx(e).collect()}
    exact = {r.event_type: r for r in QUERIES["anomaly_mad"](spark, sf_dir).collect()}
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        ap = approx[et]
        assert ap.n == ex.n
        assert abs(ap.median_value - ex.median_value) <= 0.05 * max(
            1.0, ex.median_value
        )
        assert abs(ap.mad_value - ex.mad_value) <= 0.10 * max(1.0, ex.mad_value)
        # percentile_approx with high accuracy on modest groups is exact ⇒
        # outlier counts should be near-identical
        assert abs(ap.n_outliers - ex.n_outliers) <= max(2, 0.02 * ex.n)


def test_containment_bottomk_recall_and_estimate(spark, sf_dir):
    from t20_database_etl_pipeline_assignment_spark.operators.llm import (
        containment_bottomk,
        shingles,
    )
    from t20_database_etl_pipeline_assignment_spark.sources.tables import table as tbl

    d = tbl(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split(F.col("text"), " ")
    k = F.greatest(F.lit(4), F.floor(F.size(toks) * 2 / 5).cast("int"))
    snip = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + F.lit(2000000)).alias("doc_id"),
        F.concat_ws(" ", F.slice(toks, 1, k)).alias("text"),
    )
    est = {
        (r.snippet_id, r.container_id): r.est_containment
        for r in containment_bottomk(shingles(snip), shingles(d), k=8).collect()
    }
    exact_pairs = {
        (r.snippet_id, r.container_id): r.containment
        for r in QUERIES["dedup_containment"](spark, sf_dir).collect()
    }
    # recall: every exact >=0.9 containment pair must be a sketch candidate
    missing = [p for p in exact_pairs if p not in est]
    assert not missing
    # estimate quality on true full-containment pairs: all sampled
    # shingles must hit, so the estimate is exactly 1.0
    for p, c in exact_pairs.items():
        if abs(c - 1.0) < 1e-9:
            assert abs(est[p] - 1.0) < 1e-9


def test_write_zordered_files_prune_both_dims(spark, sf_dir, tmp_path):
    from t20_database_etl_pipeline_assignment_spark.operators.analytics import (
        morton_code,
        write_zordered,
    )

    # build normalized grid coordinates the same way the audit does
    from t20_database_etl_pipeline_assignment_spark.exprs import epoch_us

    raw = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_custkey").alias("xr"),
        F.floor(epoch_us("o_orderdate") / F.lit(86_400_000_000)).alias("yr"),
    )
    stats = raw.agg(
        F.min("xr").alias("minx"),
        F.max("xr").alias("maxx"),
        F.min("yr").alias("miny"),
        F.max("yr").alias("maxy"),
    )
    j = raw.crossJoin(F.broadcast(stats)).selectExpr(
        "((xr - minx) * 65535L) div greatest(maxx - minx, 1L) AS x",
        "((yr - miny) * 65535L) div greatest(maxy - miny, 1L) AS y",
    )
    path = str(tmp_path / "zordered")
    write_zordered(j, morton_code(F.col("x"), F.col("y")), path, n_files=16)
    back = spark.read.parquet(path)
    per_file = (
        back.groupBy(F.input_file_name().alias("f"))
        .agg(
            (F.max("x") - F.min("x")).alias("wx"),
            (F.max("y") - F.min("y")).alias("wy"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert len(per_file) >= 8
    # each file's envelope must be far narrower than the 65536 domain in
    # at least one dimension, and on average in both — that's what makes
    # min/max stats prune point/range predicates on either column
    avg_wx = sum(r.wx for r in per_file) / len(per_file)
    avg_wy = sum(r.wy for r in per_file) / len(per_file)
    assert avg_wx < 65536 * 0.6 and avg_wy < 65536 * 0.6
    assert all(min(r.wx, r.wy) < 65536 * 0.51 for r in per_file)


# ---- property-based model checks (hypothesis) ------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# events: (user, us-offset, cents value); duplicates of us deliberately allowed
event_st = st.tuples(
    st.integers(min_value=0, max_value=2),
    st.integers(min_value=0, max_value=10_000_000_000),
    st.integers(min_value=0, max_value=50_000),
)
events_st = st.lists(event_st, min_size=1, max_size=40)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events=events_st)
def test_sessionize_kernel_property(spark, events):
    """On arbitrary streams (duplicate timestamps, single events, giant
    gaps) the kernel agrees with the sequential Python model."""
    from t20_database_etl_pipeline_assignment_spark.operators.analytics import (
        sessionize,
    )

    gap = 1_800_000_000
    rows = [
        (u, i, us, v) for i, (u, us, v) in enumerate(events)
    ]  # event_id = arrival index (unique tie-break)
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, us long, v_c long"
    )
    got = {
        (r.user_id, r.session_seq): r for r in sessionize(df, gap).collect()
    }
    # model
    by_user: dict[int, list] = {}
    for u, eid, us, v in rows:
        by_user.setdefault(u, []).append((us, eid, v))
    expected = {}
    for u, evs in by_user.items():
        evs.sort()
        seq = 0
        prev_us = None
        sessions: dict[int, list] = {}
        for us, eid, v in evs:
            if prev_us is None or us - prev_us > gap:
                seq += 1
                sessions[seq] = []
            sessions[seq].append((us, v))
            prev_us = us
        for sq, items in sessions.items():
            expected[(u, sq)] = items
    assert set(got) == set(expected)
    for key, items in expected.items():
        g = got[key]
        uss = [us for us, _ in items]
        assert g.n_events == len(items)
        assert g.start_us == min(uss) and g.end_us == max(uss)
        assert abs(g.sum_value - sum(v for _, v in items) / 100.0) < 1e-9


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(st.integers(min_value=0, max_value=50_000), min_size=1, max_size=40),
    mean=st.integers(min_value=0, max_value=50_000),
)
def test_cusum_kernel_identity_property(spark, vals, mean):
    """The prefix-sum − running-min window identity equals the sequential
    recursion S_i = max(0, S_{i-1} + x_i − μ − k) for arbitrary series and
    calibration targets."""
    from t20_database_etl_pipeline_assignment_spark.operators.analytics import (
        cusum_stat,
    )

    k_c, h_c = 2500, 20000
    rows = [("t", i, i, v) for i, v in enumerate(vals)]
    e = spark.createDataFrame(
        rows, "event_type string, event_id long, us long, v_c long"
    )
    targets = spark.createDataFrame([("t", mean)], "event_type string, mean_c long")
    got = sorted(
        cusum_stat(e, targets, k_c, h_c).collect(), key=lambda r: r.event_id
    )
    s = 0
    for r, v in zip(got, vals):
        s = max(0, s + v - mean - k_c)
        assert abs(r.cusum - s / 100.0) < 1e-12
        assert r.alarm == (s > h_c)


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    vals=st.lists(
        st.integers(min_value=0, max_value=50_000), min_size=1, max_size=40
    ),
    mean=st.integers(min_value=0, max_value=50_000),
    bucket=st.sampled_from([1, 2, 3, 7, 1_000]),
)
def test_cusum_segmented_carry_property(spark, vals, mean, bucket):
    """The segmented-scan recombination (per-bucket local prefix + carry
    relation) is bit-identical to the sequential recursion when the series
    is forced across MANY segments — bucket sizes down to 1 row/segment
    exercise every carry boundary, including empty-prior-frame m_in and
    all-negative / all-positive segment totals."""
    from t20_database_etl_pipeline_assignment_spark.operators.analytics import (
        cusum_stat,
    )

    k_c, h_c = 2500, 20000
    rows = [("t", i, i, v) for i, v in enumerate(vals)]
    e = spark.createDataFrame(
        rows, "event_type string, event_id long, us long, v_c long"
    )
    targets = spark.createDataFrame([("t", mean)], "event_type string, mean_c long")
    got = sorted(
        cusum_stat(e, targets, k_c, h_c, bucket_us=bucket).collect(),
        key=lambda r: r.event_id,
    )
    s = 0
    for r, v in zip(got, vals):
        s = max(0, s + v - mean - k_c)
        assert abs(r.cusum - s / 100.0) < 1e-12
        assert r.alarm == (s > h_c)


def test_reorder_interval_model(spark, sf_dir):
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .collect()
    )
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    by_cust: dict[int, list] = {}
    for r in o:
        day = int(r.o_orderdate.timestamp() * 1_000_000) // 86_400_000_000
        by_cust.setdefault(r.o_custkey, []).append((day, r.o_orderkey))
    gaps: dict[str, list[int]] = {}
    for ck, orders in by_cust.items():
        orders.sort()
        for (d1, _), (d2, _) in zip(orders, orders[1:]):
            gaps.setdefault(cust[ck], []).append(d2 - d1)
    out = {
        r.segment: r
        for r in QUERIES["reorder_interval_percentiles"](spark, sf_dir).collect()
    }
    assert set(out) == set(gaps)
    for seg, gs in gaps.items():
        gs.sort()
        n = len(gs)
        assert out[seg].n_gaps == n
        assert out[seg].p50_days == gs[(n + 1) // 2 - 1]
        assert out[seg].p90_days == gs[(9 * n + 9) // 10 - 1]
        assert out[seg].p50_days <= out[seg].p90_days


def test_intersect_all_multiset_model(spark, sf_dir):
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    a = Counter(r.c_nationkey for r in c if r.c_custkey % 2 == 0)
    b = Counter(r.c_nationkey for r in c if r.c_custkey % 3 == 0)
    expected = Counter({k: min(a[k], b[k]) for k in a if k in b})
    expected = +expected
    got = Counter(
        r.c_nationkey for r in QUERIES["set_intersect_all"](spark, sf_dir).collect()
    )
    assert got == expected


def test_ratio_to_report_sums_to_one(spark, sf_dir):
    rows = QUERIES["win_ratio_to_report"](spark, sf_dir).collect()
    by_flag: dict[str, float] = {}
    for r in rows:
        assert 0.0 <= r.share_of_flag <= 1.0
        by_flag[r.l_returnflag] = by_flag.get(r.l_returnflag, 0.0) + r.share_of_flag
    for flag, total in by_flag.items():
        assert abs(total - 1.0) < 1e-6, flag


def test_activity_streaks_model(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("user_id", "ts").collect()
    days: dict[int, set] = {}
    for r in ev:
        days.setdefault(r.user_id, set()).add(
            int(r.ts.timestamp() * 1_000_000) // 86_400_000_000
        )
    out = {r.user_id: r for r in QUERIES["win_activity_streaks"](spark, sf_dir).collect()}
    assert set(out) == set(days)
    for uid, ds in days.items():
        sorted_days = sorted(ds)
        streaks = []
        cur = 1
        for d1, d2 in zip(sorted_days, sorted_days[1:]):
            if d2 == d1 + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        assert out[uid].n_streaks == len(streaks)
        assert out[uid].longest_streak == max(streaks)
        # island invariant: span == length within every island
        assert out[uid].longest_span_check == out[uid].longest_streak


def test_gini_inequality_model(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    spend: dict[tuple, int] = {}
    for r in o:
        key = (cust[r.o_custkey], r.o_custkey)
        spend[key] = spend.get(key, 0) + int(r.o_totalprice * 100 + 0.5)
    by_seg: dict[str, list] = {}
    for (seg, ck), s in spend.items():
        by_seg.setdefault(seg, []).append((s, ck))
    out = {r.segment: r for r in QUERIES["agg_gini_inequality"](spark, sf_dir).collect()}
    assert set(out) == set(by_seg)
    for seg, xs in by_seg.items():
        xs.sort()
        n = len(xs)
        total = sum(s for s, _ in xs)
        weighted = sum((i + 1) * s for i, (s, _) in enumerate(xs))
        gini = (2 * weighted - (n + 1) * total) / (n * total)
        assert out[seg].n_customers == n
        assert abs(out[seg].gini - gini) < 1e-12
        assert 0.0 <= out[seg].gini < 1.0
        assert abs(out[seg].total_spend - total / 100.0) < 1e-6


def test_concentration_ratio_model(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").collect()
    cust = {
        r.c_custkey: r.c_mktsegment
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
    }
    spend: dict[tuple, int] = {}
    for r in o:
        key = (cust[r.o_custkey], r.o_custkey)
        spend[key] = spend.get(key, 0) + int(r.o_totalprice * 100 + 0.5)
    by_seg: dict[str, list] = {}
    for (seg, ck), s in spend.items():
        by_seg.setdefault(seg, []).append((s, ck))
    out = {
        r.segment: r
        for r in QUERIES["agg_concentration_ratio"](spark, sf_dir).collect()
    }
    for seg, xs in by_seg.items():
        xs.sort(key=lambda t: (-t[0], t[1]))
        total = sum(s for s, _ in xs)
        cr10 = sum(s for s, _ in xs[:10]) / total
        cr1 = xs[0][0] / total
        assert out[seg].n_customers == len(xs)
        assert abs(out[seg].cr10 - cr10) < 1e-12
        assert abs(out[seg].cr1 - cr1) < 1e-12
        assert 0.0 < out[seg].cr1 <= out[seg].cr10 <= 1.0
