"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
tweet-feed generator.

The reference's ingress was a bespoke network source (Twitter long-poll
via tweepy).  Spark's Python DataSource API is where such a connector
lives in this engine: implement ``DataSource`` + ``DataSourceReader``,
register once, and the feed becomes ``spark.read.format("tweetgen")``
— partition-parallel, schema-declared, usable in any query.

This generator is deterministic (pure function of row index), so the
source is *oracle-checkable*: DuckDB reproduces the same rows from
``range()`` arithmetic.  A real network connector swaps the generator
body for socket reads; partition planning and schema stay identical.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

LANGS = ["en", "de", "es", "fr", "zh"]
SCHEMA = "id bigint, user_id bigint, lang string, score double"


def gen_row(i: int) -> tuple:
    """Pure row generator — mirrored exactly by the DuckDB oracle."""
    return (
        i,
        i % 100,
        LANGS[i % 5],
        (i * 2654435761) % 1000 / 10.0,
    )


class _Partition(InputPartition):
    def __init__(self, start: int, end: int) -> None:
        self.start, self.end = start, end


def _split_range(lo: int, hi: int, n_parts: int) -> list[_Partition]:
    """Split [lo, hi) into ≤ n_parts contiguous partitions; always at
    least one (possibly empty) — the DataSource API rejects []."""
    if hi <= lo:
        return [_Partition(lo, lo)]
    step = max(1, (hi - lo) // n_parts)
    bounds = list(range(lo, hi, step)) + [hi]
    return [_Partition(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def _read_range(partition: _Partition):
    for i in range(partition.start, partition.end):
        yield gen_row(i)


class TweetGenReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        return _split_range(0, max(0, self.n_rows), self.n_parts)

    def read(self, partition: _Partition):
        return _read_range(partition)


class TweetGenStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming variant — the tweepy-Stream analog.

    Offsets are plain row indices: ``initialOffset`` starts at 0,
    ``latestOffset`` reports everything currently available (the full
    generator — a live feed would report its current head),
    ``partitions(start, end)`` splits the batch's index range, and
    ``commit`` is the ack.  Restart-safe by construction: the reader
    keeps NO progress state of its own, so after a crash Spark plans
    exactly (checkpointed offset → latest) — per-instance counters
    here would regress below the committed offset on restart and
    replay rows (a bug caught in review).  A network connector maps
    offsets to since_id/checkpoint tokens; everything else is
    identical.
    """

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        return {"offset": max(0, self.n_rows)}

    def partitions(self, start: dict, end: dict):
        return _split_range(start["offset"], end["offset"], self.n_parts)

    def read(self, partition: _Partition):
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        pass  # offsets are deterministic row indices; nothing to ack


class TweetGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "tweetgen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> TweetGenReader:
        return TweetGenReader(self.options)

    def streamReader(self, schema) -> TweetGenStreamReader:
        return TweetGenStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the tweetgen format."""
    spark.dataSource.register(TweetGenDataSource)


# ---------------------------------------------------------------------------
# Custom Python DataSource WRITE path (Spark 4): a JSONL sink whose
# writer runs on the EXECUTORS (one file per partition, two-phase
# commit via WriterCommitMessage) — completing the connector trio
# (batch read, stream read, write).
# ---------------------------------------------------------------------------
import json as _json
import os as _os
import uuid as _uuid
from dataclasses import dataclass

from pyspark.sql.datasource import DataSourceWriter, WriterCommitMessage


@dataclass
class _WroteFile(WriterCommitMessage):
    path: str
    rows: int


class JsonlSinkWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options.get("path")

    def write(self, rows) -> _WroteFile:
        """Runs per partition ON AN EXECUTOR: stream rows to a
        task-private temp file, hand the name to the driver commit."""
        _os.makedirs(self.path, exist_ok=True)  # idempotent across tasks
        tmp = _os.path.join(self.path, f"_tmp-{_uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as fh:
            for row in rows:
                fh.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _WroteFile(path=tmp, rows=n)

    def commit(self, messages) -> None:
        """Driver-side two-phase commit: atomically rename every
        task file into its final name only once ALL tasks succeeded."""
        for i, m in enumerate(messages):
            _os.rename(m.path, _os.path.join(self.path, f"part-{i:05d}.jsonl"))

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and _os.path.exists(m.path):
                _os.remove(m.path)


class JsonlSinkDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "jsonlsink"

    def schema(self) -> str:  # pragma: no cover - not used on write
        return "value string"

    def writer(self, schema, overwrite: bool) -> JsonlSinkWriter:
        return JsonlSinkWriter(self.options)


def register_sink(spark) -> None:
    """Idempotent registration of the jsonlsink format."""
    spark.dataSource.register(JsonlSinkDataSource)
