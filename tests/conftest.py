from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR_SMALL = "/root/testdata/sf0.001"
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from martian_moments_spark.session import get_spark

    s = get_spark(app_name="mm-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def spark_h(spark):
    """Alias for property tests (hypothesis + session-scoped Spark)."""
    return spark
