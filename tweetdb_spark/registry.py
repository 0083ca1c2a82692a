"""Operator registry.

Every operator from SURVEY.md §2 registers itself here via the
``@query`` decorator.  The decorated function receives
``(spark, t)`` where ``t`` is the dict of fixture DataFrames (temp
views of the same names are registered too, so ``spark.sql`` works);
the registered callable exposes the driver contract signature
``(spark, sf_dir) -> DataFrame``.

Oracle discipline (SURVEY.md §5) enforced by convention here:
- every float aggregate is rounded identically on both sides;
- every computed column is aliased identically on both sides;
- ops without a faithful ANSI-SQL equivalent register ``oracle=None``
  and get the driver's weaker rows-only check.
"""

from __future__ import annotations

import textwrap
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from tweetdb_spark.catalog import load_tables

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


class Tables(dict):
    """Fixture-table dict + the sf_dir it was loaded from (used by
    streaming operators to stage file sources)."""

    sf_dir: str = ""


def query(name: str, oracle: Optional[str] = None):
    """Register an operator under ``name`` with an optional DuckDB oracle."""

    def deco(fn: Callable[[SparkSession, dict], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            t = Tables(load_tables(spark, sf_dir))
            t.sf_dir = sf_dir
            return fn(spark, t)

        wrapped.__name__ = f"query_{name}"
        wrapped.__doc__ = fn.__doc__
        if name in QUERIES:
            raise ValueError(f"duplicate query key: {name}")
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLES[name] = textwrap.dedent(oracle).strip()
        return fn

    return deco


_LOADED = False


def load_all_operators() -> None:
    """Import every operator module (each import registers its keys)."""
    global _LOADED
    if _LOADED:
        return
    # Imports are side-effectful by design; order groups the inventory.
    from tweetdb_spark.operators import (  # noqa: F401
        scans,
        projections,
        joins,
        aggregates,
        windows,
        sortsetops,
        events,
        analytics,
        pipeline,
    )
    from tweetdb_spark.functions import scalar, udfs  # noqa: F401
    from tweetdb_spark.llm import dedup, multimodal, similarity, text  # noqa: F401
    from tweetdb_spark.streaming import queries as streaming_queries  # noqa: F401

    _LOADED = True
