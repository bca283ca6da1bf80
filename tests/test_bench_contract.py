"""Driver-contract guard for bench.py: must print exactly one JSON line with
the agreed schema, at whatever SF $SPARK_GRAFT_SF_DIR points to."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json(tmp_path):
    detail_path = str(tmp_path / "BENCH_DETAIL.json")
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_DETAIL=detail_path,
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = out.stdout.strip().splitlines()[-1]
    payload = json.loads(line)
    assert payload["unit"] == "sec"
    assert payload["sf"] == 0.001
    assert isinstance(payload["value"], (int, float))
    # stdout line stays SHORT (driver capture truncates long lines —
    # round-1 BENCH parsed:null); full per-query detail goes to disk.
    assert len(line) < 2000
    assert payload["queries"]  # top-N slowest on stdout
    assert all(isinstance(v, (int, float)) for v in payload["queries"].values())
    with open(detail_path) as f:
        detail = json.load(f)
    assert payload["n_queries"] == len(detail["queries"]) >= 99
    assert detail["value"] == payload["value"]
