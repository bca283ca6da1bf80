"""ETL-composite invariant tests (SURVEY.md §5.2.4): properties the oracle
comparison can't express — SCD2 timeline tiling, incremental idempotence."""

from __future__ import annotations

from pyspark.sql import functions as F

from t20_database_etl_pipeline_assignment_spark.operators.etl import (
    incr_load_watermark,
    merge_upsert,
    scd2_apply,
)


def _mk_dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, attr string, effective_from timestamp, effective_to timestamp, is_current boolean"
    )


def _mk_staged(spark, rows):
    return spark.createDataFrame(rows, "k long, attr string")


import datetime as _dt


def _ts(s):
    return _dt.datetime.fromisoformat(s)


def test_scd2_invariants(spark):
    target = _mk_dim(
        spark,
        [
            (1, "a", _ts("2020-01-01"), _ts("2021-01-01"), False),
            (1, "b", _ts("2021-01-01"), _ts("2200-01-01"), True),
            (2, "x", _ts("2020-01-01"), _ts("2200-01-01"), True),
        ],
    )
    staged = _mk_staged(spark, [(1, "c"), (2, "x"), (3, "new")])
    out = scd2_apply(target, staged, ["k"], ["attr"], "2022-06-01")
    rows = {(r.k, r.attr): r for r in out.collect()}

    # changed key 1: old current closed at batch_ts, new version open
    assert rows[(1, "b")].effective_to == _ts("2022-06-01")
    assert rows[(1, "b")].is_current is False
    assert rows[(1, "c")].effective_from == _ts("2022-06-01")
    assert rows[(1, "c")].is_current is True
    # unchanged key 2 passes through untouched
    assert rows[(2, "x")].is_current is True
    assert rows[(2, "x")].effective_from == _ts("2020-01-01")
    # net-new key 3 inserted open-ended
    assert rows[(3, "new")].is_current is True

    # invariants: exactly one current row per key; ranges tile without overlap
    per_key = (
        out.groupBy("k")
        .agg(
            F.sum(F.col("is_current").cast("int")).alias("n_cur"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    for r in per_key:
        assert r.n_cur == 1, f"key {r.k}: {r.n_cur} current rows"
    hist = out.filter("k = 1").orderBy("effective_from").collect()
    for a, b in zip(hist, hist[1:]):
        assert a.effective_to == b.effective_from, "timeline must tile"


def test_scd2_idempotent_reapply(spark):
    target = _mk_dim(spark, [(1, "a", _ts("2020-01-01"), _ts("2200-01-01"), True)])
    staged = _mk_staged(spark, [(1, "b")])
    once = scd2_apply(target, staged, ["k"], ["attr"], "2021-01-01")
    twice = scd2_apply(once, staged, ["k"], ["attr"], "2022-01-01")
    # re-applying the same staged batch must be a no-op (hash equal)
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_scd2_empty_staged_is_noop(spark):
    target = _mk_dim(
        spark,
        [
            (1, "a", _ts("2020-01-01"), _ts("2021-01-01"), False),
            (1, "b", _ts("2021-01-01"), _ts("2200-01-01"), True),
        ],
    )
    staged = _mk_dim(spark, []).select("k", "attr")  # empty batch, right schema
    out = scd2_apply(target, staged, ["k"], ["attr"], "2022-01-01")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, target.collect()))


def test_scd2_empty_target_bootstraps(spark):
    from t20_database_etl_pipeline_assignment_spark.operators.etl import scd2_init

    empty = _mk_dim(spark, [])
    staged = _mk_staged(spark, [(1, "a"), (2, "b")])
    out = scd2_apply(empty, staged, ["k"], ["attr"], "2022-01-01")
    rows = {(r.k, r.attr) for r in out.collect()}
    assert rows == {(1, "a"), (2, "b")}
    assert all(r.is_current for r in out.collect())
    # and scd2_init produces the same shape for a first snapshot
    init = scd2_init(staged, "2022-01-01")
    assert sorted(map(tuple, init.collect())) == sorted(map(tuple, out.collect()))


def test_merge_upsert_staged_wins(spark):
    t = spark.createDataFrame([(1, "old"), (2, "keep")], "k long, v string")
    s = spark.createDataFrame([(1, "new"), (3, "ins")], "k long, v string")
    out = {r.k: r.v for r in merge_upsert(t, s, ["k"]).collect()}
    assert out == {1: "new", 2: "keep", 3: "ins"}


def test_incremental_load_idempotent(spark):
    import datetime as dt

    loaded = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)) for i in range(10)],
        "event_id long, ts timestamp",
    )
    arriving = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(hours=i)) for i in range(15)],
        "event_id long, ts timestamp",
    )
    once = incr_load_watermark(loaded, arriving, "ts", "event_id")
    assert once.count() == 15
    again = incr_load_watermark(once, arriving, "ts", "event_id")
    assert again.count() == 15  # replaying the same batch is a no-op


def test_dq_expect_gate(spark):
    import pytest

    from t20_database_etl_pipeline_assignment_spark.operators.etl import (
        DataQualityError,
        dq_expect,
    )

    df = spark.createDataFrame([(1, 10.0), (2, -5.0), (3, 7.0)], "k long, v double")
    # passing gate returns the frame for chaining
    out = dq_expect(df, {"k_positive": F.col("k") > 0})
    assert out.count() == 3
    # violated gate names the rule and aborts
    with pytest.raises(DataQualityError, match="v_non_negative"):
        dq_expect(df, {"v_non_negative": F.col("v") >= 0})
    # a violation budget tolerates bounded dirt
    dq_expect(df, {"v_non_negative": F.col("v") >= 0}, max_violations=1)


def test_retention_prune_reconciles_with_rebuild(spark, sf_dir):
    """The prune list must be exactly the closed versions beyond the two
    newest per key in the rebuilt history — never a current row, never a
    key with <= 2 closed versions."""
    from collections import defaultdict

    from t20_database_etl_pipeline_assignment_spark.registry import QUERIES

    hist = QUERIES["scd2_rebuild_from_log"](spark, sf_dir).collect()
    closed = defaultdict(list)
    for r in hist:
        if not r.is_current:
            closed[r.o_custkey].append(r.effective_from)
    want = set()
    for k, froms in closed.items():
        for rank, ef in enumerate(sorted(froms, reverse=True), start=1):
            if rank > 2:
                want.add((k, ef, rank))
    out = QUERIES["scd2_retention_prune"](spark, sf_dir).collect()
    got = {(r.o_custkey, r.effective_from, r.version_rank) for r in out}
    assert got == want and len(want) > 0
