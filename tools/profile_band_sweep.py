"""One-off attribution probe for dedup_minhash_band_sweep (r11 §1): time
the signature aggregate, the band-join tier, the exact-truth tier, and the
full face separately so the optimization targets the real cost."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F

    from t20_database_etl_pipeline_assignment_spark.operators.llm import (
        _SWEEP_PERMS,
        corpus_shingles,
    )
    from t20_database_etl_pipeline_assignment_spark.registry import QUERIES
    from t20_database_etl_pipeline_assignment_spark.session import get_spark
    from t20_database_etl_pipeline_assignment_spark.sources.staging import (
        prune_stale_generations,
    )

    prune_stale_generations(sf_dir)
    spark = get_spark("t20-profile-bandsweep")
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES["dedup_minhash_band_sweep"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    def t(label, fn, reps=5):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        print(
            f"{label}: median {ts[len(ts)//2]:.3f} min {ts[0]:.3f} max {ts[-1]:.3f}",
            flush=True,
        )

    sh = corpus_shingles(spark, sf_dir)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    t("shingle scan", lambda: noop(sh))
    sig0 = sh.groupBy("doc_id").agg(
        *[
            F.expr(
                "min(CAST(conv(substring(md5(concat(shingle, "
                f"':{p}')), 1, 15), 16, 10) AS BIGINT)) AS mh{p}"
            )
            for p in range(_SWEEP_PERMS)
        ]
    )
    t("sig0 12-min agg", lambda: noop(sig0))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    t("sizes agg", lambda: noop(sizes))

    szd = sh.join(F.broadcast(sizes), "doc_id")
    sa, sb = szd.alias("sa"), szd.alias("sb")
    pair_rows = sa.join(
        sb,
        (F.col("sa.shingle") == F.col("sb.shingle"))
        & (F.col("sa.doc_id") < F.col("sb.doc_id"))
        & (F.col("sb.sz") <= F.lit(2) * F.col("sa.sz"))
        & (F.col("sa.sz") <= F.lit(2) * F.col("sb.sz")),
    ).select(
        F.col("sa.doc_id").alias("doc1"),
        F.col("sb.doc_id").alias("doc2"),
        F.col("sa.sz").alias("sza"),
        F.col("sb.sz").alias("szb"),
    )
    inter = (
        pair_rows.repartition(
            2 * int(spark.conf.get("spark.sql.shuffle.partitions")),
            "doc1",
            "doc2",
        )
        .groupBy("doc1", "doc2")
        .agg(
            F.count(F.lit(1)).alias("i"),
            F.first("sza").alias("sza"),
            F.first("szb").alias("szb"),
        )
    )
    truth_base = inter.filter(
        F.round(
            F.col("i") / (F.lit(1.0) * (F.col("sza") + F.col("szb") - F.col("i"))),
            6,
        )
        >= 0.5
    ).select("doc1", "doc2")
    t("truth tier (inverted index + agg)", lambda: noop(truth_base))

    t(
        "full face",
        lambda: noop(QUERIES["dedup_minhash_band_sweep"](spark, sf_dir)),
    )
    t(
        "construct only",
        lambda: QUERIES["dedup_minhash_band_sweep"](spark, sf_dir),
        reps=3,
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
