"""Fixture-keyed staging layer: persisted artifacts derived from the
read-only fixture tables (re-split scan copies, shingle relations, IVF
centroids, similarity graphs).

At 100 TB this layer is the materialized output of upstream pipeline
stages — indexes are built once and probed many times, and landing-zone
files that arrived unsplittable (single row group, vendor dumps) are
restaged into right-sized splits before compute-heavy consumers. The
cache key embeds a fingerprint of the fixture files, so a regenerated
fixture directory auto-invalidates every derived artifact instead of
silently serving results computed from the previous generation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def index_cache_dir(sf_dir: str, kind: str) -> str:
    """Per-fixture artifact directory, keyed by (dir name, content
    fingerprint) — see module docstring."""
    import hashlib
    import os
    from pathlib import Path

    root = os.environ.get(
        "T20_INDEX_CACHE",
        str(Path(__file__).resolve().parents[2] / ".index_cache"),
    )
    h = hashlib.sha256()
    try:
        for p in sorted(Path(sf_dir).glob("*.parquet")):
            st = p.stat()
            h.update(f"{p.name}:{st.st_size}:{st.st_mtime_ns};".encode())
    except OSError:
        pass
    base = os.path.basename(os.path.normpath(sf_dir))
    key = f"{base}-{h.hexdigest()[:12]}"
    return os.path.join(root, key, kind)


def prune_stale_generations(sf_dir: str) -> None:
    """Delete artifact trees from PREVIOUS fixture generations (same sf
    dir, different content fingerprint).

    Deliberately NOT called from `index_cache_dir`: pruning on every path
    resolution could delete parquet inputs out from under a still-running
    job that resolved its paths against the previous generation (e.g. a
    bench overlapping a fixture regen) — failing it with missing-file
    errors. Call this only at process startup (bench.py / drive_contract
    do), when no in-flight job can hold paths into the old generation."""
    import os
    import shutil
    from pathlib import Path

    current = Path(index_cache_dir(sf_dir, "_probe")).parent
    root, key = current.parent, current.name
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        for entry in os.listdir(root):
            if entry.startswith(f"{base}-") and entry != key:
                shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
    except OSError:
        pass


def cached_df(
    spark: SparkSession, path: str, build, partition_by: str | None = None
) -> DataFrame:
    """Read a parquet-cached DataFrame, building it once if absent. The
    build is deterministic, so cache hits are value-identical to rebuilds
    (doubles round-trip parquet exactly).

    `partition_by` writes the artifact hive-partitioned on that column —
    the at-rest layout of a 100 TB fact table — so readers get partition
    pruning / dynamic partition pruning on it for free.

    Concurrent callers (queries run in parallel threads share these
    artifacts) each build into a caller-unique tmp dir and publish with an
    atomic rename; losers discard their build. Deterministic builds make
    either winner correct.

    The returned LAZY reader handle is memoized per (Spark application,
    path): `spark.read.parquet` costs ~50-100 ms of driver-side Py4J +
    file-listing latency per call, and probe-style operators resolve 3-5
    staged artifacts per invocation, so re-resolving them dominated those
    queries' build time (r10 profile: 15 `.parquet()` calls = 1.1 s of a
    3.9 s triple-build of sim_ann_ivf_pq). This memoizes only the handle —
    every action still scans the parquet on disk — and is safe because a
    published artifact is immutable: the atomic-rename publish is
    write-once per path, and stale-generation pruning deletes only OTHER
    generations' paths at process startup."""
    import os
    import shutil
    import threading
    import uuid

    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        tmp = f"{path}.tmp-{os.getpid()}-{threading.get_ident()}-{uuid.uuid4().hex[:8]}"
        writer = build().write.mode("overwrite")
        if partition_by is not None:
            writer = writer.partitionBy(partition_by)
        writer.parquet(tmp)
        try:
            os.rename(tmp, path)  # atomic publish; fails if a winner exists
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    key = (spark.sparkContext.applicationId, path)
    got = _READER_MEMO.get(key)
    if got is None:
        got = _READER_MEMO[key] = spark.read.parquet(path)
    return got


# lazy reader handles per (application id, artifact path) — see cached_df
_READER_MEMO: dict = {}
