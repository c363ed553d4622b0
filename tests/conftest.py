import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sparkplans.session import EngineOptions, build_session

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    opts = EngineOptions(target_partitions=8)
    spark = build_session(opts, app_name="sparkplans-tests", master="local[8]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def engine(spark):
    from sparkplans.engine import Engine

    return Engine(spark=spark)
