"""Catalog + schema contract tests (SURVEY.md §1.3 gotchas)."""

from __future__ import annotations

import datetime

from tweetdb_spark import schemas


def test_all_tables_load_with_declared_schemas(tables):
    for name, df in tables.items():
        declared = schemas.TABLE_SCHEMAS[name]
        actual = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        expected = [(f.name, f.dataType.simpleString()) for f in declared.fields]
        assert actual == expected, f"{name}: {actual} != {expected}"


def test_events_ts_is_microsecond_timestamp(tables):
    row = tables["events"].select("ts").orderBy("ts").first()
    assert isinstance(row.ts, datetime.datetime)
    # fixture starts 2024-01-01 (FIXTURES.md) — UTC session renders it as-is
    assert row.ts.year == 2024


def test_events_ts_matches_duckdb_truncation(spark, tables):
    """The ns→µs shim must truncate exactly like DuckDB's native read."""
    import duckdb

    from tests.conftest import SF_DIR

    s_rows = {
        r.event_id: r.ts
        for r in tables["events"].select("event_id", "ts").limit(50).collect()
    }
    con = duckdb.connect()
    d_rows = dict(
        con.execute(
            f"SELECT event_id, ts FROM '{SF_DIR}/events.parquet' "
            f"WHERE event_id IN ({','.join(map(str, s_rows))})"
        ).fetchall()
    )
    for eid, sts in s_rows.items():
        assert sts.replace(tzinfo=None) == d_rows[eid], eid


def test_temp_views_registered(spark, tables):
    assert spark.sql("SELECT count(*) AS c FROM nation").first().c == 25
