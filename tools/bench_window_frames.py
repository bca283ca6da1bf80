"""Hot-partition micro-A/B: first() over (CURRENT ROW, UNBOUNDED FOLLOWING)
vs last() over the reversed running frame, same values, one user owning N
rows — the skew shape a 100 TB asof/interpolate job must survive."""
import sys, time
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import Window, functions as F
from t20_database_etl_pipeline_assignment_spark.session import get_spark

spark = get_spark("t20-hot-partition-ab")
spark.sparkContext.setLogLevel("ERROR")

def mk(n_rows, n_users):
    return spark.range(n_rows).select(
        (F.col("id") % n_users).alias("user_id"),
        F.col("id").alias("us"),
        (F.col("id") % 2).alias("kind"),
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 2 == 0, F.col("id") * 3).alias("v"),
    )

def run(df, w, fn, label, reps=3):
    out = df.select("user_id", "us", fn.over(w).alias("x"))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out.write.format("noop").mode("overwrite").save()
        ts.append(time.perf_counter() - t0)
    print(f"{label}: median {sorted(ts)[len(ts)//2]:.3f}", flush=True)

for n_rows, n_users in ((100_000, 1000), (100_000, 10), (100_000, 1)):
    df = mk(n_rows, n_users).localCheckpoint()
    order = [F.col("us"), F.col("kind"), F.col("event_id")]
    w_fwd = Window.partitionBy("user_id").orderBy(*order).rowsBetween(
        Window.currentRow, Window.unboundedFollowing)
    w_rev = Window.partitionBy("user_id").orderBy(*[c.desc() for c in order]).rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    print(f"--- {n_rows} rows / {n_users} users ({n_rows//n_users} rows/partition)")
    run(df, w_fwd, F.first("v", ignorenulls=True), "old: first over UNBOUNDED FOLLOWING")
    run(df, w_rev, F.last("v", ignorenulls=True), "new: last over reversed running")
spark.stop()
