"""Isolated per-query timing: run ONE registered query N times in a fresh
session with nothing else on the machine, print min/median/max.

Exists to attribute round-over-round drift in the shared bench sweep:
BENCH_DETAIL.json times every query inside a 270-query × 3-pass sweep, so
a +1 s delta on one query can be ambient load from the sweep itself (GC,
page cache, concurrent stage scheduling) rather than a plan regression.
BASELINE.md documents a ±15-25% ambient swing on this box; this tool is
the arbiter — the round-9 verdict asked for exactly this measurement for
dedup_minhash_band_sweep's 5.4 → 6.5 s drift.

Usage:
    python tools/bench_isolated.py QID [N] [SF_DIR]
Defaults: N=5, SF_DIR=/root/testdata/sf0.1. Warm pass (untimed) builds
any staged artifacts first, same split as bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    qid = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from t20_database_etl_pipeline_assignment_spark.registry import QUERIES
    from t20_database_etl_pipeline_assignment_spark.session import get_spark
    from t20_database_etl_pipeline_assignment_spark.sources.staging import (
        prune_stale_generations,
    )

    prune_stale_generations(sf_dir)
    spark = get_spark("t20-bench-isolated")
    spark.sparkContext.setLogLevel("ERROR")
    fn = QUERIES[qid]
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    ts: list[float] = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        ts.append(round(time.perf_counter() - t0, 3))
    s = sorted(ts)
    mid = len(s) // 2
    med = s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3)
    print(json.dumps({
        "qid": qid, "sf_dir": sf_dir, "n": n,
        "min": s[0], "median": med, "max": s[-1], "samples": ts,
    }))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
