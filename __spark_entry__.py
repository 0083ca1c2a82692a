"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``tweetdb_spark/`` (SURVEY.md §2 inventory);
this module only adapts the engine's registry to the contract.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the engine package lives next to this file; make the import robust
# to a driver that loads this module from a different working dir
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import tweetdb_spark  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (A2, TPC-H Q1 shape) on /root/testdata/sf0.001."""
    tweetdb_spark.load_all_operators()
    return tweetdb_spark.QUERIES["agg_grouped"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Insertion order is contract-significant: the driver grades the
    first 50 keys, so the SURVEY §2 rows lead (registry.CONTRACT_ORDER)
    and extras follow.
    """
    return tweetdb_spark.ordered_queries()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return tweetdb_spark.ordered_queries()[1]
