"""Mini-sweep: time a list of queries in ONE session (bench.py conditions:
noop sink, warm pass untimed, median of N reps), print one JSON line.

Usage: python tools/bench_sweep_subset.py QID[,QID...] [N] [SF_DIR]
Used for before/after A/Bs: run from the pre-change worktree and from HEAD
on a quiet machine."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    qids = sys.argv[1].split(",")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

    from t20_database_etl_pipeline_assignment_spark.registry import QUERIES
    from t20_database_etl_pipeline_assignment_spark.session import get_spark
    from t20_database_etl_pipeline_assignment_spark.sources.staging import (
        prune_stale_generations,
    )

    prune_stale_generations(sf_dir)
    spark = get_spark("t20-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    out = {}
    for qid in qids:
        fn = QUERIES[qid]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(round(time.perf_counter() - t0, 3))
        s = sorted(ts)
        mid = len(s) // 2
        out[qid] = {
            "median": s[mid] if len(s) % 2 else round((s[mid - 1] + s[mid]) / 2, 3),
            "min": s[0],
            "max": s[-1],
        }
        print(f"{qid}: {out[qid]}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "n": n, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
