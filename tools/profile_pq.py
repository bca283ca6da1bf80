"""One-off attribution probe for the sim_ann_ivf_pq face (r11 §1 measure-
first): split construction latency (driver-side DataFrame build) from
execution, and time the candidate subplan without the final window."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from t20_database_etl_pipeline_assignment_spark.operators import llm
    from t20_database_etl_pipeline_assignment_spark.registry import QUERIES
    from t20_database_etl_pipeline_assignment_spark.session import get_spark
    from t20_database_etl_pipeline_assignment_spark.sources.staging import (
        prune_stale_generations,
    )

    prune_stale_generations(sf_dir)
    spark = get_spark("t20-profile-pq")
    spark.sparkContext.setLogLevel("ERROR")
    # warm: builds staged artifacts + JVM
    QUERIES["sim_ann_ivf_pq"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def t(label, fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(f"{label}: median {ts[len(ts)//2]:.3f} min {ts[0]:.3f} max {ts[-1]:.3f}")

    # construction only (no action)
    t("construct full face", lambda: QUERIES["sim_ann_ivf_pq"](spark, sf_dir))
    t("construct cand only", lambda: llm._pq_candidates(spark, sf_dir))

    def run_full():
        QUERIES["sim_ann_ivf_pq"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    def run_cand():
        llm._pq_candidates(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    t("construct+run full face", run_full)
    t("construct+run cand only", run_cand)

    # codes scan alone (the probe's input artifact)
    from t20_database_etl_pipeline_assignment_spark.operators.llm import (
        _PQ_KS,
        _PQ_M,
        _cached_df,
        _index_cache_dir,
    )

    codes_dir = _index_cache_dir(sf_dir, f"ivf_pq_codes_{_PQ_M}x{_PQ_KS}")
    codes = _cached_df(spark, codes_dir, lambda: None)

    def run_codes():
        codes.write.format("noop").mode("overwrite").save()

    t("codes scan only", run_codes)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
