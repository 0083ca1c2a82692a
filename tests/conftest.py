from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from tweetdb_spark.session import get_spark

    s = get_spark("tweetdb-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tables(spark):
    from tweetdb_spark.catalog import load_tables

    return load_tables(spark, SF_DIR)


@pytest.fixture(scope="session")
def registry():
    import tweetdb_spark

    tweetdb_spark.load_all_operators()
    return tweetdb_spark
