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


class TweetGenReader(DataSourceReader):
    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))

    def partitions(self):
        if self.n_rows <= 0:
            return [_Partition(0, 0)]  # one empty partition, never zero
        step = max(1, self.n_rows // self.n_parts)
        bounds = list(range(0, self.n_rows, step)) + [self.n_rows]
        return [
            _Partition(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
        ]

    def read(self, partition: _Partition):
        for i in range(partition.start, partition.end):
            yield gen_row(i)


class TweetGenStreamReader(DataSourceStreamReader):
    """Offset-tracked streaming variant — the tweepy-Stream analog.

    Offsets are plain row indices: ``initialOffset`` starts at 0,
    ``latestOffset`` advances by ``batch_rows`` per micro-batch up to
    ``rows`` (so a run processes the feed in rate-limited chunks, like
    a long-poll connection draining), ``partitions(start, end)``
    splits each batch's index range, and ``commit`` is the ack.  A
    network connector would map offsets to since_id/checkpoint tokens;
    everything else is identical.
    """

    def __init__(self, options) -> None:
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 4))
        self.batch_rows = int(options.get("batchRows", 250))

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        # In a live source this asks the feed "what's new"; the
        # generator exposes the next rate-limited chunk each time.
        if not hasattr(self, "_cur"):
            self._cur = 0
        self._cur = min(self.n_rows, self._cur + self.batch_rows)
        return {"offset": self._cur}

    def partitions(self, start: dict, end: dict):
        lo, hi = start["offset"], end["offset"]
        if hi <= lo:
            return [_Partition(lo, lo)]
        step = max(1, (hi - lo) // self.n_parts)
        bounds = list(range(lo, hi, step)) + [hi]
        return [
            _Partition(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)
        ]

    def read(self, partition: _Partition):
        for i in range(partition.start, partition.end):
            yield gen_row(i)

    def commit(self, end: dict) -> None:
        pass  # offsets are deterministic; nothing to ack


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
