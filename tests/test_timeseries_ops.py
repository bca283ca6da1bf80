"""Semantic invariants for the time-series operators (operators/timeseries.py).

Oracle parity proves bit-equality with DuckDB; these pin the meaning: as-of
matches point backwards within tolerance, resample endpoints agree with the
bucket's actual extremes, heavy hitters really clear the threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from t20_database_etl_pipeline_assignment_spark.exprs import epoch_us
from t20_database_etl_pipeline_assignment_spark.registry import QUERIES
from t20_database_etl_pipeline_assignment_spark.sources.tables import table

TOL_US = 3_600_000_000


def test_asof_matches_point_backwards_within_tolerance(spark, sf_dir):
    out = QUERIES["join_asof_tolerance"](spark, sf_dir)
    rows = out.collect()
    assert rows
    matched = [r for r in rows if r.click_id is not None]
    assert matched, "fixture should produce at least one attributed purchase"
    for r in matched:
        assert 0 <= r.gap_us <= TOL_US
    # every matched click really is a click event of the same user, earlier
    # or simultaneous
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", epoch_us("ts").alias("us")
    )
    m = out.filter(F.col("click_id").isNotNull()).alias("m")
    joined = m.join(
        e.alias("c"), F.col("m.click_id") == F.col("c.event_id")
    ).join(e.alias("p"), F.col("m.event_id") == F.col("p.event_id"))
    bad = joined.filter(
        (F.col("c.event_type") != "click")
        | (F.col("c.user_id") != F.col("m.user_id"))
        | (F.col("c.us") > F.col("p.us"))
    )
    assert bad.count() == 0


def test_resample_endpoints_and_counts(spark, sf_dir):
    out = QUERIES["resample_time_bucket"](spark, sf_dir)
    rows = out.collect()
    assert rows
    total = sum(r.n_events for r in rows)
    assert total == table(spark, sf_dir, "events").count()
    for r in rows:
        assert r.low_value <= r.open_value <= r.high_value
        assert r.low_value <= r.close_value <= r.high_value
        if r.n_events == 1:
            assert r.open_value == r.close_value


def test_heavy_hitters_clear_threshold(spark, sf_dir):
    rows = QUERIES["agg_heavy_hitters"](spark, sf_dir).collect()
    assert rows
    total_frac = sum(r.frac for r in rows)
    assert total_frac <= 1.0
    for r in rows:
        assert r.frac >= 0.02


def test_struct_nested_is_lossless(spark, sf_dir):
    out = QUERIES["fn_struct_nested"](spark, sf_dir)
    li = table(spark, sf_dir, "lineitem")
    assert out.count() == li.count()
    # n_lines matches the true per-order line count on every row
    true_counts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("tc"))
    bad = out.join(true_counts, "l_orderkey").filter(F.col("n_lines") != F.col("tc"))
    assert bad.count() == 0


# ---------------------------------------------------------------------------
# Property-based model check of the as-of kernel
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

from t20_database_etl_pipeline_assignment_spark.operators.timeseries import (  # noqa: E402
    asof_attribute,
)

# us values stride 1.2e12 µs (20 min), so gaps of 0-3 steps sit inside the
# 1h tolerance, 3 steps hit it exactly (<= boundary), 4+ fall outside —
# plus duplicate timestamps to exercise the (us, kind, event_id) tie-break.
_STRIDE = 1_200_000_000_000
event_st = st.tuples(
    st.integers(min_value=1, max_value=2),          # user_id
    st.sampled_from(["click", "purchase"]),         # event_type
    st.integers(min_value=0, max_value=6),          # us step
)
events_st = st.lists(event_st, min_size=1, max_size=12)


def _model(rows, tol_us):
    """O(n²) reference: latest prior-or-simultaneous click per purchase,
    ties broken by larger event_id, tolerance applied after selection."""
    out = {}
    for eid, (user, kind, us) in enumerate(rows):
        if kind != "purchase":
            continue
        cands = [
            (c_us, c_eid)
            for c_eid, (c_user, c_kind, c_us) in enumerate(rows)
            if c_kind == "click" and c_user == user and c_us <= us
        ]
        if not cands:
            out[eid] = (None, None)
            continue
        c_us, c_eid = max(cands)
        gap = us - c_us
        out[eid] = (c_eid, gap) if gap <= tol_us else (None, None)
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(raw=events_st)
def test_asof_kernel_agrees_with_model(spark, raw):
    tol = 3_600_000_000_000  # 1h in µs... intentionally == 3 strides
    rows = [(user, kind, step * _STRIDE) for user, kind, step in raw]
    df = spark.createDataFrame(
        [
            (user, eid, kind, us)
            for eid, (user, kind, us) in enumerate(rows)
        ],
        "user_id long, event_id long, event_type string, us long",
    )
    got = {
        r.event_id: (r.click_id, r.gap_us)
        for r in asof_attribute(df, tol_us=tol).collect()
    }
    assert got == _model(rows, tol)


# ---------------------------------------------------------------------------
# Property-based model check of the transition-matrix op (fixture-free)
# ---------------------------------------------------------------------------

_tm_event = st.tuples(
    st.integers(min_value=1, max_value=3),       # user_id
    st.sampled_from(["a", "b", "c"]),            # event_type
    st.integers(min_value=0, max_value=5),       # ts step (dups exercised)
)
_tm_events = st.lists(_tm_event, min_size=2, max_size=14)


def _tm_model(rows):
    """Per-user streams ordered by (ts, event_id); count A→B transitions."""
    from collections import Counter, defaultdict

    streams = defaultdict(list)
    for eid, (u, t, s) in enumerate(rows):
        streams[u].append((s, eid, t))
    counts = Counter()
    for seq in streams.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    totals = Counter()
    for (a, _), n in counts.items():
        totals[a] += n
    return {
        (a, b): (n, n / totals[a]) for (a, b), n in counts.items()
    }


@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
@given(raw=_tm_events)
def test_transition_matrix_agrees_with_model(spark, raw):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    e = spark.createDataFrame(
        [
            (eid, u, t, base + dt.timedelta(minutes=s))
            for eid, (u, t, s) in enumerate(raw)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = W.partitionBy("from_type")
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in counts.select(
            "from_type",
            "to_type",
            "n",
            (F.col("n") / (F.lit(1.0) * F.sum("n").over(tot))).alias("p"),
        ).collect()
    }
    assert got == _tm_model(raw)
