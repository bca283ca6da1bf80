"""Copy-on-write table format: a JSON transaction log over plain parquet
data directories — the core of the Delta/Iceberg idea (atomic commits,
snapshot isolation, time travel, retention vacuum) rebuilt from first
principles on the same filesystem primitives the streaming sinks already
trust (streaming/scd2_sink.py's tmp+publish discipline), with ZERO
format jars: a snapshot resolves to a plain parquet path list, so Spark
reads keep column pruning / predicate pushdown / split planning exactly
as for raw parquet, and the log itself is O(#commits) JSON docs — never
touched per-row.

Reference parity: the reference declares incremental + full load
(README.md:4) and partitioning/cluster management (README.md:8); this is
the table-format face a 100 TB lake needs on top of those — versioned
atomic publish (a reader NEVER sees a torn write: either a commit doc
exists and all its data dirs are complete, or neither is visible),
AS OF time travel, and vacuum bounded by a retention window.

Log protocol (all data paths stored relative to the table root):

    _txlog/00000000.json, 00000001.json, ...    one doc per commit:
        {"version": N, "action": "overwrite"|"append",
         "add": [reldir, ...], "remove": [reldir, ...],
         "schema": simpleString, "ts": caller timestamp, }
    data/<uuid>/                                 one parquet dir per write

Commit atomicity & optimistic concurrency: the commit doc is written to
a tmp file, fsync'd, then HARD-LINKED to its final name — link(2) fails
with EEXIST when the version is already taken, so two racing writers can
never both win a version (os.rename would silently clobber the earlier
winner). A losing `tx_append` recomputes against the new head and
retries (its data dir is already on disk and version-agnostic); a losing
`tx_overwrite` raises — its remove-set described a snapshot that no
longer is the head, which is exactly Delta's write-conflict semantics. A
crash before link leaves an unreferenced data dir: invisible to every
reader, reclaimed by `tx_vacuum`.

Scale shape: commits are metadata-only (no data rewrite on append; an
overwrite writes the new data ONCE), reads plan from the log without
listing `data/`, and vacuum is a set-difference over dir names — all
O(#commits), independent of table bytes. At 100 TB the data dirs carry
hive partitioning / bucketing exactly as the raw-parquet sinks do
(operators/io_ops.py); the log layer is orthogonal to layout.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..exprs import money_sum, sql_money_sum
from ..registry import query
from ..sources.staging import index_cache_dir
from ..sources.tables import table

_LOG = "_txlog"
_DATA = "data"


class ConcurrentOverwriteError(RuntimeError):
    """An overwrite lost the commit race: its remove-set was computed
    against a snapshot that is no longer the head."""


def _log_dir(table_path: str) -> str:
    return os.path.join(table_path, _LOG)


def tx_history(table_path: str) -> list[dict]:
    """All commit docs, oldest first. Commit files are named by zero-padded
    version, so lexicographic order IS version order; docs are tiny JSON,
    so replay is metadata-cheap at any table size."""
    d = _log_dir(table_path)
    try:
        names = sorted(n for n in os.listdir(d) if n.endswith(".json"))
    except OSError:
        return []
    out = []
    for n in names:
        with open(os.path.join(d, n)) as f:
            out.append(json.load(f))
    return out


def _try_commit(table_path: str, doc: dict) -> bool:
    """Publish one commit doc atomically; False if the version was taken.

    write tmp → fsync → link(tmp, final): the doc becomes visible fully
    formed or not at all, and EEXIST (not silent replacement) decides the
    race — the property os.rename cannot give."""
    d = _log_dir(table_path)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"{doc['version']:08d}.json")
    tmp = final + f".tmp-{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(doc, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, final)
        return True
    except FileExistsError:
        return False
    finally:
        os.unlink(tmp)


def _write_data(df: DataFrame, table_path: str) -> str:
    """Write one immutable parquet data dir; returns its table-relative
    path. The dir name is a bare uuid — version-agnostic, so an append
    that loses the commit race reuses the same bytes under the next
    version instead of rewriting."""
    rel = os.path.join(_DATA, uuid.uuid4().hex)
    df.write.mode("error").parquet(os.path.join(table_path, rel))
    return rel


def _snapshot_rels(commits: list[dict], version: int) -> list[str]:
    files: list[str] = []
    for c in commits[: version + 1]:
        if c["action"] == "overwrite":
            files = list(c["add"])
        else:
            files.extend(c["add"])
    return files


def snapshot_files(table_path: str, version: int | None = None) -> list[str]:
    """Absolute parquet dirs making up a snapshot (head when version is
    None). Raises on an unknown table or out-of-range version."""
    commits = tx_history(table_path)
    if not commits:
        raise ValueError(f"not a transaction-log table: {table_path}")
    head = commits[-1]["version"]
    v = head if version is None else version
    if not 0 <= v <= head:
        raise ValueError(f"version {v} out of range 0..{head}")
    return [os.path.join(table_path, rel) for rel in _snapshot_rels(commits, v)]


def tx_read(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """AS OF read: resolve the snapshot's path list from the log and hand
    it to the plain parquet reader — pushdown/pruning/split planning are
    untouched. Reading a vacuumed-away version fails on the missing path
    (retention semantics, same as Delta)."""
    return spark.read.parquet(*snapshot_files(table_path, version))


def tx_append(df: DataFrame, table_path: str, ts: str) -> int:
    """Atomically append `df` as a new version; returns the version won.

    The data dir is written ONCE; only the metadata commit retries on a
    lost race. Appending to a non-empty table requires the schema to
    match the head commit's — schema evolution is explicitly out of
    scope (reject-by-name, never read-wrong)."""
    rel = _write_data(df, table_path)
    schema = df.schema.simpleString()
    for _ in range(16):
        commits = tx_history(table_path)
        if commits and commits[-1]["schema"] != schema:
            raise NotImplementedError(
                "schema evolution is not supported: append schema "
                f"{schema!r} != table schema {commits[-1]['schema']!r}"
            )
        doc = {
            "version": len(commits),
            "action": "append",
            "add": [rel],
            "remove": [],
            "schema": schema,
            "ts": ts,
        }
        if _try_commit(table_path, doc):
            return doc["version"]
    raise RuntimeError(f"append contention not resolved in 16 rounds: {table_path}")


def tx_overwrite(df: DataFrame, table_path: str, ts: str) -> int:
    """Atomically replace the table contents with `df`; returns the new
    version. Loses-raises: unlike append, an overwrite that lost the race
    must NOT retry blindly (its remove-set described the old head), so
    the caller decides — ConcurrentOverwriteError, Delta's conflict
    semantics. The stranded data dir is reclaimed by tx_vacuum."""
    rel = _write_data(df, table_path)
    commits = tx_history(table_path)
    doc = {
        "version": len(commits),
        "action": "overwrite",
        "add": [rel],
        "remove": _snapshot_rels(commits, len(commits) - 1) if commits else [],
        "schema": df.schema.simpleString(),
        "ts": ts,
    }
    if not _try_commit(table_path, doc):
        raise ConcurrentOverwriteError(
            f"version {doc['version']} was committed concurrently: {table_path}"
        )
    return doc["version"]


def tx_vacuum(table_path: str, keep_last: int = 1) -> list[str]:
    """Reclaim data dirs no snapshot in the retention window references:
    files overwritten before the last `keep_last` versions, plus stranded
    dirs from crashed/lost writers. Returns the removed relative paths.

    Like Delta's VACUUM, this trades time-travel depth for space — AS OF
    reads older than the window fail on the missing path afterwards — and
    must not run concurrently with an in-flight writer whose data dir has
    not yet committed (retention interval semantics)."""
    commits = tx_history(table_path)
    if not commits:
        return []
    head = commits[-1]["version"]
    lo = max(0, head - keep_last + 1)
    referenced = set()
    for v in range(lo, head + 1):
        referenced.update(_snapshot_rels(commits, v))
    removed = []
    data_dir = os.path.join(table_path, _DATA)
    try:
        names = sorted(os.listdir(data_dir))
    except OSError:
        return []
    for name in names:
        rel = os.path.join(_DATA, name)
        if rel not in referenced:
            shutil.rmtree(os.path.join(data_dir, name), ignore_errors=True)
            removed.append(rel)
    return removed


# ---------------------------------------------------------------------------
# table_time_travel
# ---------------------------------------------------------------------------

# the deterministic 4-commit history built over the orders fixture: two
# date-partitioned backfills, the tail append, then a full rewrite that
# keeps only open orders — one of each action at each position a real
# lake sees (initial load, incremental appends, compaction rewrite)
_TT_COMMITS = 4


def _tt_table(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per fixture) the 4-version orders table. The whole
    table — log and data — is built in a caller-unique tmp dir and
    published with one atomic rename, mirroring sources/staging.cached_df:
    concurrent query threads each build, one wins, losers discard; the
    deterministic build makes either winner value-identical."""
    path = index_cache_dir(sf_dir, "txtable_orders")
    done = os.path.join(
        path, _LOG, f"{_TT_COMMITS - 1:08d}.json"
    )
    if os.path.exists(done):
        return path
    tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}-{uuid.uuid4().hex[:8]}"
    orders = table(spark, sf_dir, "orders")
    d95 = F.lit("1995-01-01").cast("timestamp")
    d97 = F.lit("1997-01-01").cast("timestamp")
    tx_overwrite(
        orders.filter(F.col("o_orderdate") < d95), tmp, ts="2026-01-01T00:00:00"
    )
    tx_append(
        orders.filter(
            (F.col("o_orderdate") >= d95) & (F.col("o_orderdate") < d97)
        ),
        tmp,
        ts="2026-01-02T00:00:00",
    )
    tx_append(
        orders.filter(F.col("o_orderdate") >= d97), tmp, ts="2026-01-03T00:00:00"
    )
    tx_overwrite(
        orders.filter(F.col("o_orderstatus") == "O"), tmp, ts="2026-01-04T00:00:00"
    )
    try:
        os.rename(tmp, path)  # atomic publish; fails if a winner exists
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
    return path


@query(
    "table_time_travel",
    oracle=f"""
SELECT 0 AS version, 'overwrite' AS action, COUNT(*) AS n_rows,
       {sql_money_sum('o_totalprice')} AS sum_price
FROM orders WHERE o_orderdate < TIMESTAMP '1995-01-01'
UNION ALL
SELECT 1, 'append', COUNT(*), {sql_money_sum('o_totalprice')}
FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
UNION ALL
SELECT 2, 'append', COUNT(*), {sql_money_sum('o_totalprice')}
FROM orders
UNION ALL
SELECT 3, 'overwrite', COUNT(*), {sql_money_sum('o_totalprice')}
FROM orders WHERE o_orderstatus = 'O'
""",
)
def table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS OF reads over the transaction-log table: one aggregate per
    committed version of the 4-commit orders history. The oracle knows
    nothing about the log — it recomputes each snapshot's expected
    contents directly from the fixture filters — so a hash match proves
    the commit/replay machinery reconstructs every historical snapshot
    bit-exactly, not just the head."""
    path = _tt_table(spark, sf_dir)
    hist = tx_history(path)
    parts = [
        tx_read(spark, path, version=c["version"])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            money_sum(F.col("o_totalprice")).alias("sum_price"),
        )
        .select(
            F.lit(c["version"]).alias("version"),
            F.lit(c["action"]).alias("action"),
            "n_rows",
            "sum_price",
        )
        for c in hist
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
