"""NULL-semantics parity on inputs the sf fixtures can't reach.

The generated events fixture has no NULLs in user_id/ts/event_type, so
it masks the divergence classes round-10's verdict flagged as latent:
COUNT(DISTINCT x) excludes NULL x while count(*)-after-distinct counts
it, and DuckDB's `||` propagates NULL while concat_ws skips it.  These
tests run the RAW operator bodies on a purpose-built NULL-riddled events
table and compare against the registered DuckDB oracle on the same
parquet — the driver's parity bar, on inputs the driver never sends.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from tools.check import rows_multiset

_TS = dt.datetime(2024, 3, 1, 12, 0, 0)


def _t(minutes: int) -> dt.datetime:
    return _TS + dt.timedelta(minutes=minutes)


# (event_id, ts, user_id, event_type, value, props) — exercises:
#  - NULL user_id inside a group that also has real users ("click")
#  - a group whose user_ids are ALL NULL ("ghost": distinct_users must
#    be 0, and the group must survive the decomposed join)
#  - NULL ts (NULL day) inside "click"
#  - NULL event_type (a NULL GROUP BY key in both engines, and a path
#    segment concat_ws would silently skip)
#  - NULL value (SUM skips it in both engines)
NULL_EVENTS = [
    (1, _t(0), 10, "click", 1.0, None),
    (2, _t(1), None, "click", 2.0, None),      # NULL user in mixed group
    (3, None, 11, "click", 3.0, None),         # NULL ts → NULL day
    (4, _t(2), 10, "click", None, None),       # NULL value
    (5, _t(3), None, "ghost", 4.0, None),      # all-NULL-user group
    (6, _t(4), None, "ghost", 5.0, None),
    (7, _t(5), 12, None, 6.0, None),           # NULL event_type group
    (8, _t(6), 12, None, 7.0, None),
    # user 20: a 5-step journey with a NULL event_type in the middle —
    # the NULL must break the 3-gram on BOTH sides, not be skipped
    (9, _t(10), 20, "a", 1.0, None),
    (10, _t(11), 20, "b", 1.0, None),
    (11, _t(12), 20, None, 1.0, None),
    (12, _t(13), 20, "c", 1.0, None),
    (13, _t(14), 20, "d", 1.0, None),
    # user 21: clean 4-step journey → paths a>b>c and b>c>d
    (14, _t(20), 21, "a", 1.0, None),
    (15, _t(21), 21, "b", 1.0, None),
    (16, _t(22), 21, "c", 1.0, None),
    (17, _t(23), 21, "d", 1.0, None),
    # user 22: NULL-ts event in a 4-step journey — Spark sorts NULLs
    # FIRST ascending, DuckDB defaults them LAST; the oracle pins
    # NULLS FIRST so both engines read the journey x>y>z>w
    (18, None, 22, "x", 1.0, None),
    (19, _t(30), 22, "y", 1.0, None),
    (20, _t(31), 22, "z", 1.0, None),
    (21, _t(32), 22, "w", 1.0, None),
]


@pytest.fixture(scope="module")
def null_events(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nullsem") / "events.parquet")
    df = spark.createDataFrame(
        NULL_EVENTS,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    return {"events": spark.read.parquet(path)}, con


def _parity(key, fn, fixture, spark):
    t, con = fixture
    import tweetdb_spark

    tweetdb_spark.load_all_operators()
    from tweetdb_spark.registry import ORACLES

    sdf = fn(spark, t)
    s_rows = [tuple(r) for r in sdf.collect()]
    res = con.execute(ORACLES[key])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert len(s_rows) == len(d_rows), f"{key}: rowcount {len(s_rows)} vs {len(d_rows)}"
    assert rows_multiset(sdf.columns, s_rows) == rows_multiset(d_cols, d_rows), key
    return s_rows


def test_agg_multi_distinct_decomposed_null_parity(null_events, spark):
    """distinct_users/distinct_days must exclude NULLs (COUNT(DISTINCT)
    semantics), an all-NULL-user group must still appear with count 0,
    and the NULL event_type group must survive the decomposed joins."""
    from tweetdb_spark.operators.aggregates import agg_multi_distinct_decomposed

    rows = _parity(
        "agg_multi_distinct_decomposed",
        agg_multi_distinct_decomposed,
        null_events,
        spark,
    )
    by_type = {r[0]: r for r in rows}
    # (event_type, distinct_users, distinct_days, n_events, sum_cents)
    assert by_type["click"][1] == 2       # users 10, 11 — NULL excluded
    assert by_type["click"][2] == 1       # one real day — NULL ts excluded
    assert by_type["click"][3] == 4
    assert by_type["ghost"][1] == 0       # all-NULL users → 0, group kept
    assert by_type["ghost"][2] == 1
    assert None in by_type                # NULL group key kept
    assert by_type[None][1] == 2          # users 12 and 20 (event 11)


def test_events_top_paths_null_parity(null_events, spark):
    """A NULL event_type mid-journey must break the 3-gram identically
    on both engines — concat_ws must never synthesize a 2-segment path
    the oracle's NULL-propagating `||` would reject."""
    from tweetdb_spark.operators.events import events_top_paths

    rows = _parity("events_top_paths", events_top_paths, null_events, spark)
    paths = {r[0] for r in rows}
    # user 21's clean journey yields both 3-grams; user 20's NULL-broken
    # journey contributes no 3-gram (a>b interrupted, c>d too short) —
    # crucially no second "a>b>c" from skipping the NULL.  The NULL
    # *user* partition (events 2, 5, 6 — both engines group NULL
    # user_ids into one window partition) yields click>ghost>ghost.
    assert paths == {
        "a>b>c",
        "b>c>d",
        "click>ghost>ghost",
        # user 22: the NULL-ts event sorts FIRST in both engines (the
        # oracle pins NULLS FIRST to match Spark's ascending default),
        # so the journey is x>y>z>w
        "x>y>z",
        "y>z>w",
    }
    assert all(r[1] == 1 for r in rows)


def test_events_pattern_detect_null_parity(null_events, spark):
    """A user whose event_types are ALL NULL has a NULL journey: Spark's
    regexp_extract propagates NULL while the oracle's no-match COALESCE
    used to turn it into '' (r11 NULL-survey catch)."""
    from tweetdb_spark.operators.events import events_pattern_detect

    rows = _parity("events_pattern_detect", events_pattern_detect, null_events, spark)
    by_user = {r[0]: r for r in rows}
    # user 12: both events have NULL event_type → NULL journey → every
    # derived column NULL (including first_path)
    assert by_user[12][1:] == (None, None, None, None)


def test_events_sliding_null_ts_dropped(null_events, spark):
    """Spark's window(ts, ...) generates NO window for a NULL event
    time; the oracle's raw bucket arithmetic must not keep a NULL-window
    group (r11 NULL-survey catch)."""
    from tweetdb_spark.operators.events import events_sliding

    rows = _parity("events_sliding", events_sliding, null_events, spark)
    assert all(r[0] is not None for r in rows)


def test_events_funnel_zero_signups_null_rates(null_events, spark):
    """No signup events → n_signup = 0: rates must be NULL on both
    engines (DuckDB x/0 is NULL; Spark needs try_divide — the plain `/`
    crashed with ANSI DIVIDE_BY_ZERO, r11 NULL-survey catch)."""
    from tweetdb_spark.operators.events import events_funnel

    rows = _parity("events_funnel", events_funnel, null_events, spark)
    assert len(rows) == 1
    n_signup, n_view, n_purchase, view_rate, purchase_rate = rows[0]
    assert n_signup == 0
    assert view_rate is None and purchase_rate is None
