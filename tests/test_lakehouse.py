"""Transaction-log table format (operators/lakehouse.py): commit
atomicity, snapshot replay, time travel, conflict semantics, vacuum
retention — the invariants a lake table must keep under crashes and
racing writers, checked on tiny generated tables plus the registered
fixture face."""

from __future__ import annotations

import json
import os

import pytest

from t20_database_etl_pipeline_assignment_spark.operators.lakehouse import (
    ConcurrentOverwriteError,
    _try_commit,
    snapshot_files,
    tx_append,
    tx_history,
    tx_overwrite,
    tx_read,
    tx_vacuum,
)
from t20_database_etl_pipeline_assignment_spark.registry import QUERIES

_SCHEMA = "k long, v string"


def _df(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def _t(tmp_path, name="t"):
    return str(tmp_path / name)


def test_append_overwrite_read_roundtrip(spark, tmp_path):
    t = _t(tmp_path)
    assert tx_overwrite(_df(spark, [(1, "a")]), t, ts="t0") == 0
    assert tx_append(_df(spark, [(2, "b")]), t, ts="t1") == 1
    assert tx_append(_df(spark, [(3, "c")]), t, ts="t2") == 2
    got = sorted((r.k, r.v) for r in tx_read(spark, t).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    assert [c["action"] for c in tx_history(t)] == [
        "overwrite", "append", "append",
    ]
    assert [c["ts"] for c in tx_history(t)] == ["t0", "t1", "t2"]


def test_time_travel_reconstructs_every_version(spark, tmp_path):
    t = _t(tmp_path)
    tx_append(_df(spark, [(1, "a")]), t, ts="t0")
    tx_append(_df(spark, [(2, "b")]), t, ts="t1")
    tx_overwrite(_df(spark, [(9, "z")]), t, ts="t2")
    tx_append(_df(spark, [(10, "y")]), t, ts="t3")
    want = {
        0: [(1, "a")],
        1: [(1, "a"), (2, "b")],
        2: [(9, "z")],
        3: [(9, "z"), (10, "y")],
    }
    for v, rows in want.items():
        got = sorted((r.k, r.v) for r in tx_read(spark, t, version=v).collect())
        assert got == rows, f"version {v}"
    # head == latest version
    assert snapshot_files(t) == snapshot_files(t, 3)
    with pytest.raises(ValueError):
        snapshot_files(t, 4)
    with pytest.raises(ValueError):
        snapshot_files(str(tmp_path / "missing"))


def test_commit_race_is_decided_by_link_not_rename(spark, tmp_path):
    """Two writers computing the same version: exactly one link wins;
    the loser's doc never clobbers the winner's."""
    t = _t(tmp_path)
    tx_append(_df(spark, [(1, "a")]), t, ts="t0")
    doc = {"version": 1, "action": "append", "add": ["data/x"],
           "remove": [], "schema": _SCHEMA, "ts": "racer1"}
    assert _try_commit(t, doc)
    doc2 = dict(doc, ts="racer2")
    assert not _try_commit(t, doc2)
    assert tx_history(t)[1]["ts"] == "racer1"
    # no tmp litter left behind by either side
    assert all(
        not n.startswith("00000001.json.tmp")
        for n in os.listdir(os.path.join(t, "_txlog"))
    )


def test_append_retries_past_a_lost_race(spark, tmp_path, monkeypatch):
    """An append that reads a stale head retries at the next version
    instead of failing — its data dir is version-agnostic."""
    import t20_database_etl_pipeline_assignment_spark.operators.lakehouse as lh

    t = _t(tmp_path)
    tx_append(_df(spark, [(1, "a")]), t, ts="t0")
    real = lh.tx_history
    calls = {"n": 0}

    def stale_once(path):
        calls["n"] += 1
        h = real(path)
        return h[:-1] if calls["n"] == 1 else h  # first read misses the head

    monkeypatch.setattr(lh, "tx_history", stale_once)
    # the stale read computes version 0 (taken) -> link fails -> retry wins 1
    assert tx_append(_df(spark, [(2, "b")]), t, ts="t1") == 1
    monkeypatch.setattr(lh, "tx_history", real)
    got = sorted((r.k, r.v) for r in tx_read(spark, t).collect())
    assert got == [(1, "a"), (2, "b")]


def test_overwrite_conflict_raises(spark, tmp_path, monkeypatch):
    import t20_database_etl_pipeline_assignment_spark.operators.lakehouse as lh

    t = _t(tmp_path)
    tx_append(_df(spark, [(1, "a")]), t, ts="t0")
    tx_append(_df(spark, [(2, "b")]), t, ts="t1")
    real = lh.tx_history
    monkeypatch.setattr(lh, "tx_history", lambda p: real(p)[:-1])
    with pytest.raises(ConcurrentOverwriteError):
        tx_overwrite(_df(spark, [(9, "z")]), t, ts="t2")
    monkeypatch.setattr(lh, "tx_history", real)
    # the loser changed nothing: head still version 1, content intact
    assert tx_history(t)[-1]["version"] == 1
    got = sorted((r.k, r.v) for r in tx_read(spark, t).collect())
    assert got == [(1, "a"), (2, "b")]


def test_schema_evolution_is_rejected_by_name(spark, tmp_path):
    t = _t(tmp_path)
    tx_append(_df(spark, [(1, "a")]), t, ts="t0")
    other = spark.createDataFrame([(1, 2.0)], "k long, x double")
    with pytest.raises(NotImplementedError):
        tx_append(other, t, ts="t1")


def test_stranded_data_is_invisible_then_vacuumed(spark, tmp_path):
    """A crash between data write and commit leaves an unreferenced dir:
    readers never see it; vacuum reclaims it."""
    t = _t(tmp_path)
    tx_append(_df(spark, [(1, "a")]), t, ts="t0")
    stranded = os.path.join(t, "data", "deadbeefcafe")
    _df(spark, [(666, "ghost")]).write.parquet(stranded)
    got = sorted((r.k, r.v) for r in tx_read(spark, t).collect())
    assert got == [(1, "a")]
    removed = tx_vacuum(t, keep_last=10)
    assert removed == [os.path.join("data", "deadbeefcafe")]
    assert not os.path.exists(stranded)


def test_vacuum_trades_time_travel_for_space(spark, tmp_path):
    t = _t(tmp_path)
    tx_overwrite(_df(spark, [(1, "a")]), t, ts="t0")
    tx_overwrite(_df(spark, [(2, "b")]), t, ts="t1")
    tx_append(_df(spark, [(3, "c")]), t, ts="t2")
    removed = tx_vacuum(t, keep_last=2)  # window = versions 1..2
    # version 0's overwritten file is reclaimed; 1..2 share their files
    assert len(removed) == 1
    got = sorted((r.k, r.v) for r in tx_read(spark, t).collect())
    assert got == [(2, "b"), (3, "c")]
    assert sorted(
        (r.k, r.v) for r in tx_read(spark, t, version=1).collect()
    ) == [(2, "b")]
    # the pre-vacuum version resolves in the log but its data is gone
    with pytest.raises(Exception):
        tx_read(spark, t, version=0).collect()
    # history is retained even where data is not (audit survives vacuum)
    assert len(tx_history(t)) == 3


def test_commit_docs_record_remove_sets(spark, tmp_path):
    t = _t(tmp_path)
    tx_append(_df(spark, [(1, "a")]), t, ts="t0")
    tx_append(_df(spark, [(2, "b")]), t, ts="t1")
    tx_overwrite(_df(spark, [(9, "z")]), t, ts="t2")
    h = tx_history(t)
    assert h[0]["remove"] == [] and h[1]["remove"] == []
    assert sorted(h[2]["remove"]) == sorted(h[0]["add"] + h[1]["add"])
    # every doc is valid standalone JSON on disk (atomic full-doc publish)
    for n in sorted(os.listdir(os.path.join(t, "_txlog"))):
        with open(os.path.join(t, "_txlog", n)) as f:
            assert json.load(f)["version"] == int(n.split(".")[0])


def test_time_travel_face_matches_direct_filters(spark, sf_dir):
    """The registered face's per-version aggregates equal the same
    aggregates computed directly from the fixture — the machinery adds
    and removes exactly the right files at every version."""
    from pyspark.sql import functions as F

    from t20_database_etl_pipeline_assignment_spark.exprs import money_sum
    from t20_database_etl_pipeline_assignment_spark.sources.tables import table

    got = {
        r.version: (r.action, r.n_rows, r.sum_price)
        for r in QUERIES["table_time_travel"](spark, sf_dir).collect()
    }
    orders = table(spark, sf_dir, "orders")
    d95 = F.lit("1995-01-01").cast("timestamp")
    d97 = F.lit("1997-01-01").cast("timestamp")
    want_src = {
        0: ("overwrite", orders.filter(F.col("o_orderdate") < d95)),
        1: ("append", orders.filter(F.col("o_orderdate") < d97)),
        2: ("append", orders),
        3: ("overwrite", orders.filter(F.col("o_orderstatus") == "O")),
    }
    assert set(got) == set(want_src)
    for v, (action, df) in want_src.items():
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            money_sum(F.col("o_totalprice")).alias("s"),
        ).collect()[0]
        assert got[v] == (action, row.n, row.s), f"version {v}"
