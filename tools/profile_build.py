"""Split per-query wall time into DataFrame CONSTRUCTION (driver-side
Py4J/analysis latency building the plan) vs ACTION (noop-sink execution),
for a list of queries — the guide-§1 empirical step that found the r10
Py4J wins: a query whose build dominates is optimized at the driver
boundary, one whose action dominates is optimized in the plan.

Usage: python tools/profile_build.py QID[,QID...] [N] [SF_DIR]
Prints one line per query: median build / median action over N reps
(after one untimed warm rep), then a JSON summary line.
"""
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
    spark = get_spark("t20-profile-build")
    spark.sparkContext.setLogLevel("ERROR")

    def med(xs: list[float]) -> float:
        s = sorted(xs)
        m = len(s) // 2
        return s[m] if len(s) % 2 else round((s[m - 1] + s[m]) / 2, 3)

    out = {}
    for qid in qids:
        fn = QUERIES[qid]
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
        builds, actions = [], []
        for _ in range(n):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 3))
            actions.append(round(t2 - t1, 3))
        out[qid] = {"build": med(builds), "action": med(actions)}
        print(f"{qid}: build {out[qid]['build']}s action {out[qid]['action']}s",
              flush=True)
    print(json.dumps({"sf_dir": sf_dir, "n": n, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
