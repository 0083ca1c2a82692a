"""Driver-contract smoke tests (__spark_entry__)."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    # Q1 shape: 2 group keys + 8 aggregates
    assert len(df.columns) == 10


def test_every_oracle_key_has_a_query():
    qs = entry_mod.queries()
    os_ = entry_mod.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracle keys without queries: {missing}"
    assert len(qs) >= 40


def test_queries_are_callable_signature(spark):
    qs = entry_mod.queries()
    df = qs["scan_parquet"](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
