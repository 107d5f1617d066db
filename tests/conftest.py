from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickbom_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = os.environ.get("SPARK_GRAFT_PARITY_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    # The test workload is latency-bound (thousands of tiny jobs), not
    # throughput-bound: local[8] measured ~20% faster end-to-end than
    # local[32] (fewer near-empty tasks and Python workers per stage).
    # setdefault keeps any externally-set SPARK_MASTER authoritative.
    os.environ.setdefault("SPARK_MASTER", "local[8]")
    s = get_spark("clickbom-tests", shuffle_partitions=8)
    yield s
