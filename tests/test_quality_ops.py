"""Semantic invariants for the corpus-quality operators (operators/quality.py).

Oracle parity (tests/test_oracle_parity.py) already proves bit-equality with
DuckDB; these tests pin the *meaning*: flags are consistent with their
definitions, components are valid partitions of the similarity graph, and
redaction is idempotent.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from t20_database_etl_pipeline_assignment_spark.registry import QUERIES


def test_repetition_fractions_bounded(spark, sf_dir):
    rows = QUERIES["text_repetition_filter"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.dup_token_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert r.keep == (r.dup_token_frac < 0.9)
        assert r.n_distinct <= r.n_tokens


def test_pii_redact_removes_all_digits(spark, sf_dir):
    df = QUERIES["pii_redact"](spark, sf_dir)
    leftover = df.filter(F.col("props_redacted").rlike("[0-9]")).count()
    assert leftover == 0
    # idempotence: redacting already-redacted text changes nothing
    again = df.select(
        F.regexp_replace("props_redacted", "[0-9]+", "<NUM>").alias("twice"),
        "props_redacted",
    ).filter(F.col("twice") != F.col("props_redacted"))
    assert again.count() == 0


def test_contamination_benchmark_excluded_and_bounded(spark, sf_dir):
    rows = QUERIES["contamination_ngram"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_id % 97 != 0  # benchmark docs are never audited
        assert 0 <= r.n_hit <= r.n_grams
        assert r.contaminated == (r.contam_frac >= 0.5)


def test_connected_components_validity(spark, sf_dir):
    """Every doc and its clone (doc_id + 1e6) share a component, the
    component label is the minimum member id, and labels are members of
    their own component."""
    labels = QUERIES["cluster_connected_components"](spark, sf_dir)
    pdf = labels.toPandas().set_index("doc_id")["component"]
    n = len(pdf)
    assert n % 2 == 0 and n > 0
    for doc_id, comp in pdf.items():
        if doc_id < 1000000:
            assert pdf[doc_id + 1000000] == comp  # clone edge honored
        assert comp <= doc_id  # label is a minimum
        assert pdf[comp] == comp  # representative labels itself


def test_star_contraction_logn_on_deep_path(spark):
    """The large-star/small-star loop must handle a DEEP component — a
    64-node path graph (diameter 63), far deeper than any fixture near-dup
    cluster — and converge in O(log n) iterations, not O(diameter):
    ≤ 2·log2(64) + 2 = 14 including the confirming no-change pass. Labels
    must all collapse to the path minimum."""
    import math

    from t20_database_etl_pipeline_assignment_spark.operators.quality import (
        _star_contract,
    )

    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "u long, v long"
    )
    star, iters = _star_contract(edges)
    bound = 2 * int(math.log2(n)) + 2
    assert iters <= bound, f"took {iters} iterations, bound {bound}"
    rows = star.collect()
    assert {r.u for r in rows} == {0}  # every edge points at the root
    assert {r.v for r in rows} == set(range(1, n))


def test_star_contraction_stops_only_on_true_stars(spark):
    """The r10 convergence check declares the fixed point from the star
    SHAPE (no hub is a leaf, no leaf has two hubs) instead of waiting for
    a no-change round. Adversarial shapes that LOOK converged but are not
    min-rooted stars yet — a shared leaf with two hubs (0-5, 1-5), a
    triangle, and a hub chain — must still contract to the component
    minimum, and an already-star input must return in one round."""
    from t20_database_etl_pipeline_assignment_spark.operators.quality import (
        _star_contract,
    )

    def roots(edge_list):
        star, iters = _star_contract(
            spark.createDataFrame(edge_list, "u long, v long")
        )
        rows = star.collect()
        # output must BE min-rooted stars: u never appears as a v
        assert {r.u for r in rows}.isdisjoint({r.v for r in rows})
        return {r.v: r.u for r in rows}, iters

    # shared leaf, two hubs: small_star must merge 0 and 1 through 5
    comp, _ = roots([(0, 5), (1, 5)])
    assert comp == {1: 0, 5: 0}
    # triangle: one component rooted at its minimum
    comp, _ = roots([(10, 11), (11, 12), (10, 12)])
    assert comp == {11: 10, 12: 10}
    # already a min-rooted star: converges and stays a star in one round
    comp, iters = roots([(7, 8), (7, 9), (7, 20)])
    assert comp == {8: 7, 9: 7, 20: 7}
    assert iters == 1


def test_star_contraction_multi_component(spark):
    """Two interleaved odd/even chains (ids interleave, so min-labels must
    cross-propagate correctly) plus an isolated-free check: each chain
    collapses to its own minimum."""
    from t20_database_etl_pipeline_assignment_spark.operators.quality import (
        _star_contract,
    )

    edges = spark.createDataFrame(
        [(2 * i, 2 * i + 2) for i in range(20)]
        + [(2 * i + 1, 2 * i + 3) for i in range(20)],
        "u long, v long",
    )
    star, _ = _star_contract(edges)
    comp = {r.v: r.u for r in star.collect()}
    for i in range(1, 21):
        assert comp[2 * i] == 0
        assert comp[2 * i + 1] == 1


def test_anomaly_zscore_is_outlier_subset(spark, sf_dir):
    rows = QUERIES["anomaly_zscore"](spark, sf_dir).collect()
    assert rows  # fixture has heavy-tailed values
    for r in rows:
        assert abs(r.zscore) > 3.0


def test_ntile_cume_shapes(spark, sf_dir):
    df = QUERIES["win_ntile_cume"](spark, sf_dir)
    agg = df.groupBy("o_orderpriority").agg(
        F.min("decile").alias("lo"),
        F.max("decile").alias("hi"),
        F.max("cume").alias("cmax"),
        F.min("pct_rank").alias("pmin"),
    )
    for r in agg.collect():
        assert r.lo == 1 and r.hi == 10
        assert r.cmax == 1.0
        assert r.pmin == 0.0


def test_mode_is_actual_maximum(spark, sf_dir):
    from t20_database_etl_pipeline_assignment_spark.sources.tables import table

    modes = {
        r.c_mktsegment: (r.mode_priority, r.mode_count)
        for r in QUERIES["agg_mode"](spark, sf_dir).collect()
    }
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    counts = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    best: dict[str, int] = {}
    for r in counts:
        best[r.c_mktsegment] = max(best.get(r.c_mktsegment, 0), r.n)
    assert set(modes) == set(best)
    for seg, (_, n) in modes.items():
        assert n == best[seg]


def test_dim_reduce_preserves_distances_loosely(spark, sf_dir):
    """JL property smoke: for a handful of vector pairs, the 8-d projected
    L2 distance correlates with the original 64-d distance (loose bound —
    8 dims give coarse preservation; we assert positive correlation, not a
    tight epsilon)."""
    import math

    from t20_database_etl_pipeline_assignment_spark.sources.tables import table

    proj = {
        r.vec_id: [r[f"r{k}"] for k in range(8)]
        for r in QUERIES["emb_dim_reduce"](spark, sf_dir).filter("vec_id < 20").collect()
    }
    orig = {
        r.vec_id: list(r.embedding)
        for r in table(spark, sf_dir, "embeddings").filter("vec_id < 20").collect()
    }
    pairs = [(i, j) for i in range(10) for j in range(i + 1, 10)]

    def l2(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    d2_orig = [l2(orig[i], orig[j]) ** 2 for i, j in pairs]
    # E[||Rx||²] = m·||x||² for a ±1 sign matrix with m=8 rows; divide out
    d2_proj = [l2(proj[i], proj[j]) ** 2 / 8.0 for i, j in pairs]
    ratio = (sum(d2_proj) / len(d2_proj)) / (sum(d2_orig) / len(d2_orig))
    # near-equidistant random vectors make per-pair ratios noisy (sd ~
    # 1/sqrt(8)), but the MEAN squared distance is preserved in expectation
    assert 0.6 < ratio < 1.4, ratio


def test_centroid_distance_ranks_true_outliers(spark, sf_dir):
    rows = QUERIES["emb_centroid_distance"](spark, sf_dir).collect()
    by_label: dict[int, list] = {}
    for r in rows:
        assert r.dist >= 0
        by_label.setdefault(r.label, []).append(r.dist)
    for label, dists in by_label.items():
        assert len(dists) == 5


def test_cluster_canonical_election_model(spark, sf_dir):
    """Full pandas replay of the survivor election: exactly one survivor
    per component, the survivor self-elects, and it is the (n_chars DESC,
    doc_id ASC) maximum of its cluster — the same ordering the oracle's
    ROW_NUMBER uses."""
    import pandas as pd

    out = QUERIES["dedup_cluster_canonical"](spark, sf_dir).toPandas()
    assert len(out) and (out.doc_id < 1000000).all()
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    m = out.merge(docs, on="doc_id", validate="one_to_one")
    for comp, grp in m.groupby("component"):
        kept = grp[grp.is_kept == 1]
        assert len(kept) == 1
        winner = grp.sort_values(["n_chars", "doc_id"], ascending=[False, True]).iloc[0]
        assert (grp.canonical_id == winner.doc_id).all()
        assert kept.iloc[0].doc_id == winner.doc_id


def test_kcore_membership_model(spark, sf_dir):
    """Python replay of the three peel rounds over the same edge set the
    engine used (read back from the shared artifact): identical survivor
    set and degrees, and the peel must actually remove something."""
    from collections import defaultdict

    from t20_database_etl_pipeline_assignment_spark.operators.quality import (
        _cached_sym_graph,
    )

    edges = {(r.src, r.dst) for r in _cached_sym_graph(spark, sf_dir).collect()}
    assert edges
    cur = set(edges)
    for _ in range(3):
        deg = defaultdict(int)
        for s, _d in cur:
            deg[s] += 1
        keep = {n for n, d in deg.items() if d >= 2}
        cur = {(s, d) for s, d in cur if s in keep and d in keep}
    want = defaultdict(int)
    for s, _d in cur:
        want[s] += 1
    out = {
        r.doc_id: r.core_deg
        for r in QUERIES["graph_kcore_membership"](spark, sf_dir).collect()
    }
    assert out == dict(want)
    # the peel is live: some node present in the raw graph fell out
    raw_nodes = {s for s, _ in edges}
    assert set(out) < raw_nodes
