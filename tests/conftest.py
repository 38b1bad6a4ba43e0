"""Shared fixtures: one session-scoped local SparkSession."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMALL = os.path.join(TESTDATA, "sf0.001")
SF_ORACLE = os.path.join(TESTDATA, "sf0.01")


@pytest.fixture(scope="session")
def spark():
    from downloader_spark.session import get_spark

    spark = get_spark(app_name="downloader-spark-tests", cores=4, shuffle_partitions=8)
    yield spark
    spark.stop()
