"""Semantic invariants for the time-series operators (operators/timeseries.py).

Oracle parity proves bit-equality with DuckDB; these pin the meaning: as-of
matches point backwards within tolerance, resample endpoints agree with the
bucket's actual extremes, heavy hitters really clear the threshold.
"""

from __future__ import annotations

from pyspark.sql import functions as F

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
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
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
