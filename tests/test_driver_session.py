"""Driver-fidelity gate: every registered query must pass its oracle on a
VANILLA SparkSession with none of session.py's configs.

Round-1 lesson (VERDICT.md §what's-wrong #4): the builder's own harness ran
under session.py, whose `nanosAsLong` config masked the fact that every
events.parquet read crashed in the driver's own session. A vanilla-session
subprocess is the only faithful replica, so this test shells out to
tools/drive_contract.py (fresh JVM, zero inherited conf).
"""
from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_full_contract_on_vanilla_session(sf_dir):
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "drive_contract.py"), sf_dir],
        capture_output=True,
        text=True,
        timeout=900,
        cwd=REPO,
    )
    tail = "\n".join(proc.stdout.splitlines()[-8:])
    assert proc.returncode == 0, (
        f"vanilla-session contract failed:\n{tail}\n{proc.stderr[-2000:]}"
    )
