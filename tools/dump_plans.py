"""Dump `.explain("formatted")` for the given query ids into a directory —
the before/after plan evidence the optimization rounds commit under
plans/r<N>/.

Usage:
    python tools/dump_plans.py OUT_DIR SUFFIX qid [qid ...]
        [--sf SF_DIR]

Writes OUT_DIR/<qid>_<SUFFIX>.txt. Run once from the pre-change checkout
(a git worktree) with SUFFIX=before and once at HEAD with SUFFIX=after.
Point T20_INDEX_CACHE at the main repo's .index_cache when running from a
worktree so staged artifacts are shared instead of rebuilt (builds are
value-identical across the rewrite — oracle-proven)."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    out_dir, suffix, qids = args[0], args[1], args[2:]
    os.makedirs(out_dir, exist_ok=True)

    from t20_database_etl_pipeline_assignment_spark.registry import QUERIES
    from t20_database_etl_pipeline_assignment_spark.session import get_spark

    spark = get_spark("t20-plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for qid in qids:
        df = QUERIES[qid](spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{qid}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
