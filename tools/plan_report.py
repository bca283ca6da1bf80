"""Regenerate PLANS.md: annotated physical plans for the headline queries.

Run from the repo root:  python tools/plan_report.py
The annotations state what each plan MUST show (the property the matching
test in tests/test_plan_quality.py pins); the plan text below them is the
live `.explain("simple")` output at sf0.1, so a reviewer can check the
claim against the evidence without running Spark.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t20_database_etl_pipeline_assignment_spark.plans.inspect import plan_string  # noqa: E402
from t20_database_etl_pipeline_assignment_spark.registry import QUERIES  # noqa: E402
from t20_database_etl_pipeline_assignment_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SHOWCASE = [
    (
        "join_multiway_star",
        "Star join: every dimension arrives as BroadcastHashJoin (no "
        "SortMergeJoin), the l_shipdate predicate reaches the lineitem scan "
        "as PushedFilters, and ReadSchema carries only the 4 needed columns "
        "of 16. At 1000 executors the fact table streams once; dimensions "
        "ship once per executor.",
    ),
    (
        "sql_unshipped_revenue_topk",
        "TPC-H Q3 shape from SQL text: both date predicates push into the "
        "scans, customer broadcasts, and the global top-10 is "
        "TakeOrderedAndProject — per-partition heaps, no global sort of the "
        "join output.",
    ),
    (
        "dedup_minhash_lsh",
        "MinHash-LSH probe: since round 4 the 64-perm/16-band signature "
        "index is a PERSISTED fixture-keyed artifact (corpus_minhash_bands), "
        "so the probe plan is just the band-bucket self-join over the staged "
        "parquet plus exact-Jaccard verification of the candidate set — "
        "linear in corpus + collisions, never all-pairs, and no min-hash "
        "aggregation at query time. Since round 9 the verification rides "
        "per-doc shingle LISTS (one collect_list per doc, array_intersect "
        "per candidate, the two list joins sharing a ReusedExchange) — no "
        "pair-keyed aggregation exists in the plan at all, which is what "
        "removed the last sf10 spill (1.9 GB -> 0).",
    ),
    (
        "interval_peak_concurrency",
        "Sweep line: the interval self-join is replaced by ±1 endpoint "
        "rows, one window pass per event_type, and a broadcast of the tiny "
        "per-type maxima — no CartesianProduct, no O(n²) overlap join.",
    ),
    (
        "incr_load_watermark",
        "Incremental load: the high-watermark is a 1-row broadcast "
        "(BroadcastNestedLoopJoin on a scalar, the reviewed allowlist "
        "shape), and the new-rows filter lands on the events scan — the "
        "petabyte log is never rescanned past the watermark at steady "
        "state.",
    ),
    (
        "dedup_span_ngram",
        "Span-level dedup stays linear — and since round 10, JOIN-FREE: "
        "the exploded span stream crosses ONE hash(span) Exchange that "
        "the (doc,span) dedup, the document-frequency window, and the "
        "conditional per-doc fold all inherit; no doc×doc join (or any "
        "join) anywhere in the tree, which is what lets it run BEFORE "
        "the quadratic verifiers at 100 TB.",
    ),
    (
        "win_cusum_drift",
        "Segmented CUSUM scan (round 10): the big window partitions on "
        "(event_type, DAY bucket) — parallelism tracks the log's time "
        "span, not the handful of event types — and the tiny carry "
        "relation (exclusive segment totals + prior minima, one window "
        "over |types|x|days| rows) comes back as a BroadcastHashJoin. The "
        "carry branch's aggregate reads the big exchange via AQE stage "
        "reuse (bkt is built non-nullable so both lineages canonicalize "
        "equal), so shuffle WRITE stays 1x. Flat-vs-segmented A/B: "
        "BENCH_CUSUM.json.",
    ),
    (
        "skyline_pareto",
        "Pareto skyline as ONE range-window sweep per brand (Window over "
        "exact cents, RANGE … 1 PRECEDING): the naive O(n²) NOT EXISTS "
        "self-join never appears — no join operator at all, just a keyed "
        "sort + running max inside each brand partition.",
    ),
    (
        "zorder_cluster_audit",
        "Z-order layout audit: the Morton interleave is a codegen'd "
        "bitwise Project (no UDF), the min/max grid stats arrive as a "
        "1-row broadcast, and the bucket key is a bit-prefix shift — one "
        "keyed HashAggregate, no global sort anywhere. The production "
        "write swaps the audit agg for repartitionByRange(zcode).",
    ),
    (
        "attribution_last_touch",
        "Last-touch attribution: clicks and purchases union into ONE "
        "ordered log and a single running last(ignorenulls) window per "
        "user recovers each purchase's latest prior click — one Exchange "
        "on user_id, one Window, no range join, no per-purchase probe; "
        "cost is independent of history length.",
    ),
    (
        "sql_correlated_scalar_subquery",
        "Correlated scalar subqueries from SQL text: Catalyst decorrelates "
        "both per-customer aggregates into grouped joins over one orders "
        "scan family — no per-row re-scan, no nested-loop anywhere; the "
        "text surface gets the same scale plan as the DSL.",
    ),
    (
        "sql_large_volume_customer",
        "TPC-H Q18 shape: the HAVING-pruned big-order list is the BUILD "
        "side of both joins (BroadcastHashJoin into orders, then into "
        "customer) — lineitem never shuffle-joins orders; at 100 TB the "
        "survivor set is hundreds of rows and both joins stay KB-build "
        "broadcasts.",
    ),
    (
        "text_boilerplate_scrub",
        "Corpus rewrite that stays linear: segment explode → document-"
        "frequency HashAggregate (the boilerplate head combines map-side "
        "by construction — the most frequent segments combine best) → one "
        "co-partitioned join back on the segment key → integer-sorted "
        "reassembly per doc. No doc×doc join; the plan is the same pass "
        "budget as the span-dup signal.",
    ),
    (
        "sql_discount_revenue",
        "TPC-H Q6 shape: all three range predicates (ship date, discount "
        "band, quantity cap) appear in PushedFilters — at 100 TB the scan "
        "skips row groups on statistics and the query reads a fraction of "
        "the fact table; no join, one 1-row fold.",
    ),
    (
        "sim_ann_ivf_adc",
        "IVF-ADC search: the probe-time corpus scan is the persisted int8 "
        "codes table (ivf_adc_codes in the scan location — 4x smaller than "
        "the float corpus, no embedding column anywhere downstream of it); "
        "probes, centroids, and queries all arrive as BroadcastHashJoin on "
        "the cell/query key, reconstruction is a narrow zip_with, and the "
        "only keyed Exchange is the final per-query candidate window.",
    ),
    (
        "sim_ann_ivf_pq",
        "IVF-PQ search: the probe-time corpus scan is the persisted "
        "m=16-code table (ivf_pq_codes — ~5x smaller than the SQ8 codes, "
        "~21x than the float corpus; no embedding column downstream); "
        "reconstruction + cosine run in ONE Arrow MapInPandas kernel "
        "(r11 — the ~32 KB scale-constant codebook is collected and "
        "closed over it, the FAISS in-RAM shape; ascending-dim float64 "
        "accumulation is bit-identical to the old interpreted fold, "
        "pinned in tests), so the plan shows a MapInPandas node over the "
        "six needed columns and NO per-row interpreted HOF fold; the "
        "join/window shape is identical to the float and SQ8 rungs — "
        "swapping compression tiers never changes the plan.",
    ),
    (
        "sim_ann_ivf_pq_refine",
        "PQ probe + exact re-rank (FAISS IndexRefineFlat shape): the "
        "candidate stage is the identical PQ probe plan (shared "
        "_pq_candidates — codes-table scan, Arrow MapInPandas scorer), "
        "then the "
        "c*|Q|-row top-c candidate list arrives as the BUILD side of a "
        "BroadcastHashJoin on neighbor_id against the float corpus "
        "scanned once — a point-lookup fetch, no SortMergeJoin, no new "
        "corpus Exchange; the only added shuffles are the two tiny "
        "per-query windows (top-c, final top-5).",
    ),
    (
        "dedup_semantic_cluster",
        "SemDeDup over the learned IVF blocking: the corpus joins the "
        "persisted coarse-quantizer assignment (ivf index scan, no k-means "
        "recompute at probe time), the ONLY corpus-sized Exchange is the "
        "hash partition on cell that within-cell pairing inherently needs "
        "(the Arrow block-pair kernel runs inside it, capped at "
        "block_size^2 sims per task), and the greedy canonical election is "
        "a per-drop_id window over the tiny above-threshold pair set.",
    ),
]


def main() -> None:
    spark = get_spark("t20-plan-report")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — annotated physical plans for the headline queries",
        "",
        f"Generated by `tools/plan_report.py` at `{SF_DIR}` "
        "(re-run after plan-affecting changes). Each annotation states the "
        "property the matching tests/test_plan_quality.py gate pins; the "
        "plan text is live `.explain(\"simple\")` output.",
        "",
    ]
    for qid, note in SHOWCASE:
        plan = plan_string(QUERIES[qid](spark, SF_DIR), mode="simple").rstrip()
        out += [f"## {qid}", "", note, "", "```", plan, "```", ""]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote PLANS.md ({len(SHOWCASE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
