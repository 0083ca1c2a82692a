"""Checkpoint-recovery chaos tests: stop a streaming query, restart it
from the SAME checkpoint, and prove exactly-once output.

The sink operators (stream_sink_parquet, sink_jdbc_batch) claim
exactly-once over at-least-once delivery via the file-sink commit log
and batchId-idempotent upserts respectively.  The oracle checks can't
see restarts, so these tests drive the restart path explicitly:

- restart with NO new data  → output unchanged (re-delivery is a no-op)
- restart WITH new data     → output equals a batch over all data,
                              every source row counted exactly once
"""

from __future__ import annotations

import json
import os
import sqlite3

import pytest

from pyspark.sql import functions as F

from tweetdb_spark.streaming.sources import EVENTS_WIRE


def _write_day(src_dir: str, day: int, rows: list[tuple[int, int, float]]) -> None:
    """rows = [(event_id, user_id, value)]; ts spread across the day."""
    with open(os.path.join(src_dir, f"day-{day:02d}.json"), "w") as fh:
        for i, (eid, uid, val) in enumerate(rows):
            fh.write(
                json.dumps(
                    {
                        "event_id": eid,
                        "ts_us": (day * 86_400 + i) * 1_000_000,
                        "user_id": uid,
                        "event_type": "purchase",
                        "value": val,
                        "props": "{}",
                    }
                )
                + "\n"
            )


@pytest.fixture()
def dirs(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    return str(src), str(tmp_path / "ckpt"), str(tmp_path / "out")


def _stream(spark, src):
    return spark.readStream.schema(EVENTS_WIRE).option(
        "maxFilesPerTrigger", "1"
    ).json(src)


def test_parquet_sink_restart_is_exactly_once(spark, dirs):
    src, ckpt, out = dirs
    _write_day(src, 1, [(1, 10, 5.0), (2, 11, 7.0)])
    _write_day(src, 2, [(3, 10, 1.0)])

    def run():
        q = (
            _stream(spark, src)
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = sorted(r.event_id for r in spark.read.parquet(out).collect())
    assert first == [1, 2, 3]

    # restart, no new data: the committed offsets make this a no-op
    run()
    assert sorted(r.event_id for r in spark.read.parquet(out).collect()) == [1, 2, 3]

    # restart after new data arrives: only the new file is processed,
    # nothing re-emitted — still exactly one row per source event
    _write_day(src, 3, [(4, 12, 2.0), (5, 10, 9.0)])
    run()
    assert sorted(r.event_id for r in spark.read.parquet(out).collect()) == [1, 2, 3, 4, 5]


def test_foreachbatch_upsert_restart_is_exactly_once(spark, dirs):
    src, ckpt, _ = dirs
    db = os.path.join(os.path.dirname(ckpt), "sink.db")
    con = sqlite3.connect(db)
    con.execute("PRAGMA journal_mode=WAL")
    con.execute(
        "CREATE TABLE totals (user_id INTEGER PRIMARY KEY, n INTEGER, total REAL)"
    )
    con.commit()
    con.close()

    _write_day(src, 1, [(1, 10, 5.0), (2, 11, 7.0)])
    _write_day(src, 2, [(3, 10, 1.0)])

    def upsert(batch_df, batch_id):
        def write_partition(part):
            rows = [(int(r.user_id), int(r.n), float(r.total)) for r in part]
            if not rows:
                return
            c = sqlite3.connect(db, timeout=30.0)
            c.execute("PRAGMA busy_timeout = 30000")
            c.executemany("INSERT OR REPLACE INTO totals VALUES (?, ?, ?)", rows)
            c.commit()
            c.close()

        batch_df.coalesce(2).foreachPartition(write_partition)

    def run():
        per_user = (
            _stream(spark, src)
            .groupBy("user_id")
            .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        )
        q = (
            per_user.writeStream.outputMode("complete")
            .foreachBatch(upsert)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def table():
        c = sqlite3.connect(db)
        got = sorted(c.execute("SELECT user_id, n, total FROM totals").fetchall())
        c.close()
        return got

    run()
    assert table() == [(10, 2, 6.0), (11, 1, 7.0)]

    run()  # restart, no new data: upserts converge to the same state
    assert table() == [(10, 2, 6.0), (11, 1, 7.0)]

    # restart with new data: the state store recovered from the
    # checkpoint must still hold the old counts (no re-read of days 1-2)
    _write_day(src, 3, [(4, 12, 2.0), (5, 10, 9.0)])
    run()
    assert table() == [(10, 3, 15.0), (11, 1, 7.0), (12, 1, 2.0)]
