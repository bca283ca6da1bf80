"""win_cusum_drift segmented-scan A/B (round-10: the last structural
scale watch-item from the r9 verdict). The pre-round-10 kernel computed
the CUSUM prefix identity with windows PARTITIONED BY event_type alone —
correct, zero-spill, but its big window ran 5-wide forever: parallelism
was capped at the number of event types (5 in every fixture), which is
exactly the plan that serializes on a 1000-executor cluster where one
task would own a type's entire 100 TB history. r9 telemetry recorded the
symptom: sf10 ratio 11.75x for 100x rows with only 189 MB of shuffle.

The shipped kernel (operators/analytics.py cusum_stat) decomposes the
scan over (event_type, day) segments — local prefix/min per segment in
parallel, a types*days-row carry relation combined with a tiny window,
broadcast back — so parallelism scales with the log's TIME SPAN. This
harness measures both formulations at the scale fixtures with per-stage
telemetry and records the effective parallelism of the heaviest stage
(executorRunTime / stage wall): the number that was pinned at ~5 and
should now track min(#segments, #cores).

Both variants are bit-identical by construction (integer cents; the
hypothesis model-check in tests/test_analytics_ops.py proves the carry
recombination); the workers also cross-check rows / alarm count / an
integer checksum of the statistic.

Usage:
    python tools/bench_cusum.py [--sf10 DIR] [--sf1 DIR]
    python tools/bench_cusum.py --worker VARIANT SF_DIR PASSES
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF10_DEFAULT = os.path.join(REPO, ".scale_fixtures", "sf10")
SF1_DEFAULT = os.path.join(REPO, ".scale_fixtures", "sf1")


# ---------------------------------------------------------------------------
# plan variants (worker side)
# ---------------------------------------------------------------------------


def _flat_df(spark, sf_dir: str):
    """The superseded r3–r9 kernel: prefix sum − running min with both
    windows partitioned by event_type only (parallelism = #types)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from t20_database_etl_pipeline_assignment_spark.exprs import (
        epoch_us,
        scaled_long,
    )
    from t20_database_etl_pipeline_assignment_spark.operators.analytics import (
        _CUSUM_H_C,
        _CUSUM_K_C,
    )
    from t20_database_etl_pipeline_assignment_spark.sources.tables import table

    e = table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        epoch_us("ts").alias("us"),
        scaled_long(F.col("value"), 100).alias("v_c"),
    )
    m = e.groupBy("event_type").agg(
        ((F.sum("v_c") - F.sum("v_c") % F.count(F.lit(1))) / F.count(F.lit(1)))
        .cast("long")
        .alias("mean_c")
    )
    run = Window.partitionBy("event_type").orderBy("us", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    p = e.join(F.broadcast(m), "event_type").select(
        "event_type",
        "event_id",
        "us",
        F.sum(F.col("v_c") - F.col("mean_c") - F.lit(_CUSUM_K_C))
        .over(run)
        .alias("pref"),
    )
    s = p.select(
        "event_type",
        "event_id",
        "us",
        (F.col("pref") - F.least(F.min("pref").over(run), F.lit(0)))
        .cast("long")
        .alias("cusum_c"),
    )
    return s.select(
        "event_type",
        "event_id",
        "us",
        (F.col("cusum_c") / F.lit(100.0)).alias("cusum"),
        (F.col("cusum_c") > F.lit(_CUSUM_H_C)).alias("alarm"),
    )


def _segmented_df(spark, sf_dir: str):
    from t20_database_etl_pipeline_assignment_spark.registry import QUERIES

    return QUERIES["win_cusum_drift"](spark, sf_dir)


# ---------------------------------------------------------------------------
# telemetry (worker side)
# ---------------------------------------------------------------------------


def _stages(spark) -> list[dict]:
    import urllib.request

    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _ts_ms(s: str) -> float:
    return datetime.strptime(s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp() * 1e3


def _heaviest_stage(stages: list[dict]) -> dict:
    """Effective parallelism of the stage that did the most executor work:
    executorRunTime / (completion − first task launch). The flat kernel's
    big window pins this near the event-type count; the segmented kernel
    should track min(#segments, #cores)."""
    if not stages:
        return {}
    s = max(stages, key=lambda x: x.get("executorRunTime", 0))
    try:
        wall_ms = _ts_ms(s["completionTime"]) - _ts_ms(s["firstTaskLaunchedTime"])
    except (KeyError, ValueError):
        wall_ms = 0.0
    run_ms = s.get("executorRunTime", 0)
    return {
        "name": s.get("name", "")[:60],
        "num_tasks": s.get("numTasks", 0),
        "executor_run_ms": run_ms,
        "stage_wall_ms": round(wall_ms),
        "effective_parallelism": round(run_ms / wall_ms, 1) if wall_ms > 0 else None,
    }


def _worker(variant: str, sf_dir: str, passes: str) -> None:
    os.environ["T20_UI_ENABLED"] = "true"
    from pyspark.sql import functions as F

    from t20_database_etl_pipeline_assignment_spark.session import (
        get_spark,
        shuffle_partitions_for,
    )
    from t20_database_etl_pipeline_assignment_spark.sources.staging import (
        prune_stale_generations,
    )

    prune_stale_generations(sf_dir)
    spark = get_spark("t20-bench-cusum")
    spark.sparkContext.setLogLevel("ERROR")
    if "T20_SHUFFLE_PARTITIONS" not in os.environ:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(shuffle_partitions_for(sf_dir))
        )
    fn = _flat_df if variant == "flat" else _segmented_df
    # untimed warm pass: builds the staged events artifact + JIT
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    walls: list[float] = []
    telem: dict = {}
    n = int(passes)
    for i in range(n):
        mark = max((s["stageId"] for s in _stages(spark)), default=-1)
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 3))
        if i == n - 1:
            time.sleep(1)  # listener-bus settle
            stages = [s for s in _stages(spark) if s["stageId"] > mark]
            telem = {
                "n_stages": len(stages),
                "shuffle_write_mb": round(
                    sum(s.get("shuffleWriteBytes", 0) for s in stages) / 1e6, 1
                ),
                "shuffle_read_mb": round(
                    sum(s.get("shuffleReadBytes", 0) for s in stages) / 1e6, 1
                ),
                "spill_memory_mb": round(
                    sum(s.get("memoryBytesSpilled", 0) for s in stages) / 1e6, 1
                ),
                "spill_disk_mb": round(
                    sum(s.get("diskBytesSpilled", 0) for s in stages) / 1e6, 1
                ),
                "peak_stage_execution_memory_mb": round(
                    max((s.get("peakExecutionMemory", 0) for s in stages), default=0)
                    / 1e6,
                    1,
                ),
                "heaviest_stage": _heaviest_stage(stages),
            }
    # bit-identity cross-check: integer checksum of the statistic + alarms
    chk = (
        fn(spark, sf_dir)
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum((F.col("cusum") * 100).cast("long")).alias("checksum_c"),
            F.sum(F.col("alarm").cast("long")).alias("alarms"),
        )
        .collect()[0]
    )
    rec = {
        "variant": variant,
        "sf_dir": sf_dir,
        "walls_sec": walls,
        "median_sec": sorted(walls)[len(walls) // 2],
        "rows": chk.rows,
        "checksum_c": chk.checksum_c,
        "alarms": chk.alarms,
        "telemetry": telem,
    }
    print("WORKER_JSON:" + json.dumps(rec), flush=True)


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def _run(variant: str, sf_dir: str, passes: int = 3) -> dict:
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker",
         variant, sf_dir, str(passes)],
        capture_output=True,
        text=True,
        timeout=1800,
        cwd=REPO,
    )
    for line in p.stdout.splitlines():
        if line.startswith("WORKER_JSON:"):
            return json.loads(line[len("WORKER_JSON:"):])
    tail = (p.stderr or p.stdout).strip().splitlines()[-3:]
    return {"variant": variant, "sf_dir": sf_dir, "status": "error", "tail": tail}


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        _worker(*sys.argv[2:5])
        return 0
    args = sys.argv[1:]
    sf10 = SF10_DEFAULT
    sf1 = SF1_DEFAULT
    if "--sf10" in args:
        sf10 = args[args.index("--sf10") + 1]
    if "--sf1" in args:
        sf1 = args[args.index("--sf1") + 1]

    from bench_scaling import host_fingerprint  # noqa: E402 — tools sibling

    out: dict = {"sf10_dir": sf10, "sf1_dir": sf1, "host": host_fingerprint()}
    for tier, d in (("sf1_ab", sf1), ("sf10_ab", sf10)):
        runs = [_run(v, d) for v in ("flat", "segmented")]
        for r in runs:
            print(json.dumps(r), flush=True)
        out[tier] = runs
        done = [r for r in runs if "rows" in r]
        agree = len(done) == len(runs) and len(
            {(r["rows"], r["checksum_c"], r["alarms"]) for r in done}
        ) == 1
        out[tier + "_outputs_agree"] = agree
        print(f"{tier}_outputs_agree: {agree}")

    path = os.path.join(REPO, "BENCH_CUSUM.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"-> {path}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.join(REPO, "tools"))
    raise SystemExit(main())
