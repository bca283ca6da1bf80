from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from t20_database_etl_pipeline_assignment_spark.session import get_spark  # noqa: E402

# Correctness tests default to the sf the driver uses for the oracle gate can
# be overridden for quick local iteration (T20_TEST_SF=sf0.001).
TEST_SF = os.environ.get("T20_TEST_SF", "sf0.01")
SF_DIR = f"/root/testdata/{TEST_SF}"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("t20-tests")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
