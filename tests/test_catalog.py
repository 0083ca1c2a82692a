"""Catalog + schema contract tests (SURVEY.md §1.3 gotchas)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

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


# ---------------------------------------------------------------------------
# Fixture-vintage regression tests (the round-4 incident).
#
# The driver's events.parquet has shipped in two physical encodings across
# fixture generations: TIMESTAMP(NANOS) (reads as int64-ns under
# nanosAsLong=true) and plain TIMESTAMP(µs).  Round 4's unconditional
# `ts div 1000` shim crashed on the µs vintage and red-carded all 50
# CORRECTNESS rows.  These tests write one tiny events parquet PER VINTAGE
# and assert read_table normalizes every one to the identical declared
# schema and identical ts values — plus the loud-failure path for a
# vintage nobody taught it yet.
# ---------------------------------------------------------------------------

# 2024-01-01 00:00:00.000001500 UTC and a second value one hour later:
# sub-µs ns component exercises the truncation edge.
_TS_NS = [1704067200000001500, 1704070800000002999]
_TS_US_TRUNC = [t // 1000 for t in _TS_NS]


def _write_events_vintage(tmp_path, ts_array: pa.Array, name: str) -> str:
    """Write a 2-row events.parquet with ts encoded per the vintage,
    columns deliberately in a NON-declared physical order to prove
    read_table re-orders every vintage."""
    table = pa.table(
        {
            "ts": ts_array,
            "event_id": pa.array([1, 2], pa.int64()),
            "user_id": pa.array([10, 20], pa.int64()),
            "event_type": pa.array(["click", "view"], pa.string()),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}'], pa.string()),
        }
    )
    d = tmp_path / name
    d.mkdir()
    pq.write_table(table, str(d / "events.parquet"))
    return str(d)


def _load_normalized(spark, sf_dir):
    from tweetdb_spark.catalog import read_table

    df = read_table(spark, sf_dir, "events")
    cols = [f.name for f in df.schema.fields]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    rows = {r.event_id: r.ts for r in df.collect()}
    return cols, types, rows


def test_read_table_normalizes_both_fixture_vintages(spark, tmp_path):
    """ns-vintage and µs-vintage must load to identical schema + values."""
    ns_dir = _write_events_vintage(
        tmp_path, pa.array(_TS_NS, pa.timestamp("ns")), "ns_vintage"
    )
    us_dir = _write_events_vintage(
        tmp_path, pa.array(_TS_US_TRUNC, pa.timestamp("us", tz="UTC")),
        "us_vintage",
    )
    ns_cols, ns_types, ns_rows = _load_normalized(spark, ns_dir)
    us_cols, us_types, us_rows = _load_normalized(spark, us_dir)

    declared = [f.name for f in schemas.EVENTS.fields]
    assert ns_cols == declared, "ns vintage: column order not normalized"
    assert us_cols == declared, "µs vintage: column order not normalized"
    assert ns_types["ts"] == "timestamp"
    assert us_types["ts"] == "timestamp"
    # identical wall-clock values: the ns shim truncates to the same µs
    # the µs vintage stores natively (DuckDB-truncation parity)
    assert ns_rows == us_rows
    assert ns_rows[1] == datetime.datetime(2024, 1, 1, 0, 0, 0, 1)


def test_read_table_normalizes_ntz_vintage(spark, tmp_path):
    """TIMESTAMP(isAdjustedToUTC=false) + inferTimestampNTZ=true (a
    locked-down-conf scenario) must still come out TimestampType."""
    ntz_dir = _write_events_vintage(
        tmp_path, pa.array(_TS_US_TRUNC, pa.timestamp("us")), "ntz_vintage"
    )
    old = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        cols, types, rows = _load_normalized(spark, ntz_dir)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old)
    assert cols == [f.name for f in schemas.EVENTS.fields]
    assert types["ts"] == "timestamp"
    assert rows[1] == datetime.datetime(2024, 1, 1, 0, 0, 0, 1)


def test_read_table_normalizes_raw_epoch_micros_vintage(spark, tmp_path):
    """ts as raw INT64 epoch-µs (no logical annotation): the unit must
    be recovered from row-group statistics magnitude."""
    raw_dir = _write_events_vintage(
        tmp_path, pa.array(_TS_US_TRUNC, pa.int64()), "raw_us_vintage"
    )
    cols, types, rows = _load_normalized(spark, raw_dir)
    assert cols == [f.name for f in schemas.EVENTS.fields]
    assert types["ts"] == "timestamp"
    assert rows[1] == datetime.datetime(2024, 1, 1, 0, 0, 0, 1)


def test_read_table_normalizes_epoch_seconds_vintage(spark, tmp_path):
    """ts as raw INT64 epoch-seconds — the other magnitude band."""
    secs = [t // 1_000_000_000 for t in _TS_NS]
    raw_dir = _write_events_vintage(
        tmp_path, pa.array(secs, pa.int64()), "raw_s_vintage"
    )
    _, types, rows = _load_normalized(spark, raw_dir)
    assert types["ts"] == "timestamp"
    assert rows[1] == datetime.datetime(2024, 1, 1, 0, 0, 0)


def test_read_table_normalizes_orders_timestamp_vintages(spark, tmp_path):
    """The normalization is table-generic: o_orderdate shipped as
    TIMESTAMP(ns) or DATE must land as the declared TimestampType."""
    from tweetdb_spark.catalog import read_table

    def write_orders(ts_array, name):
        table = pa.table(
            {
                "o_orderkey": pa.array([1, 2], pa.int64()),
                "o_custkey": pa.array([7, 8], pa.int64()),
                "o_orderstatus": pa.array(["O", "F"], pa.string()),
                "o_totalprice": pa.array([10.0, 20.0], pa.float64()),
                "o_orderdate": ts_array,
                "o_orderpriority": pa.array(["1-URGENT", "2-HIGH"], pa.string()),
            }
        )
        d = tmp_path / name
        d.mkdir()
        pq.write_table(table, str(d / "orders.parquet"))
        return str(d)

    ns_dir = write_orders(
        pa.array([_TS_NS[0], _TS_NS[1]], pa.timestamp("ns")), "orders_ns"
    )
    date_dir = write_orders(
        pa.array([datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]),
        "orders_date",
    )
    for d in (ns_dir, date_dir):
        df = read_table(spark, d, "orders")
        assert df.schema["o_orderdate"].dataType.simpleString() == "timestamp"
        assert df.select("o_orderdate").first().o_orderdate.year == 2024


def test_read_table_fails_loudly_on_unknown_vintage(spark, tmp_path):
    """A vintage nobody taught read_table (ts as string) must raise a
    TypeError naming the dtype at plan time — not crash 50 queries deep."""
    bad_dir = _write_events_vintage(
        tmp_path,
        pa.array(["2024-01-01T00:00:00", "2024-01-01T01:00:00"], pa.string()),
        "bad_vintage",
    )
    from tweetdb_spark.catalog import read_table

    with pytest.raises(TypeError, match="unsupported loaded type"):
        read_table(spark, bad_dir, "events")
