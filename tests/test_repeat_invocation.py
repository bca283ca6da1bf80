"""Repeated-invocation determinism gate.

Running a registered query twice in ONE process must produce identical
results. This catches mutable-module-state bugs (round 2 example:
StructType.add mutated the shared PART_SCHEMA, so the second
scan_json_badrecords invocation crashed with COLUMN_ALREADY_EXISTS) and
any scratch-path / cached-index staleness between invocations. Runs at
sf0.001 so the double pass stays cheap.
"""

from __future__ import annotations

import pytest

from t20_database_etl_pipeline_assignment_spark.registry import QUERIES

SF_SMALL = "/root/testdata/sf0.001"


def _canon(df):
    rows = [tuple(str(v) for v in r) for r in df.collect()]
    return sorted(rows)


@pytest.mark.parametrize("qid", sorted(QUERIES))
def test_second_invocation_identical(spark, qid):
    first = _canon(QUERIES[qid](spark, SF_SMALL))
    second = _canon(QUERIES[qid](spark, SF_SMALL))
    assert first == second, f"{qid}: second in-process invocation diverged"
