"""Short/empty-input edge cases the sf fixtures can't reach.

The generated documents fixture has ≥10 tokens / ≥47 chars per doc, so
it masks the sequence-descend and empty-text divergence classes.  These
tests run the RAW operator bodies on a purpose-built tiny corpus and
compare against the registered DuckDB oracle on the same parquet — the
same parity bar as the driver, on inputs the driver never sends.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tools.check import rows_multiset

EDGE_DOCS = [
    # (doc_id, text): empty, 1 token, 2 tokens, 1 char, token-dupes
    (1, ""),
    (2, "solo"),
    (3, "two tokens"),
    (4, "x"),
    (5, "a a a a"),
    (6, "the quick brown fox jumps over the lazy dog"),
]


@pytest.fixture(scope="module")
def edge(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("edge") / "documents.parquet")
    df = spark.createDataFrame(
        [
            (i, txt, "en", "edge", len(txt))
            for i, txt in EDGE_DOCS
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    return {"documents": spark.read.parquet(path)}, con


def _parity(key, fn, edge, spark):
    t, con = edge
    sdf = fn(spark, t)
    s_rows = [tuple(r) for r in sdf.collect()]
    import tweetdb_spark

    tweetdb_spark.load_all_operators()
    from tweetdb_spark.registry import ORACLES

    res = con.execute(ORACLES[key])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert len(s_rows) == len(d_rows), f"{key}: rowcount {len(s_rows)} vs {len(d_rows)}"
    assert rows_multiset(sdf.columns, s_rows) == rows_multiset(d_cols, d_rows), key
    return s_rows


def test_bigram_logprob_short_docs(edge, spark):
    from tweetdb_spark.llm.text import text_bigram_logprob

    rows = _parity("text_bigram_logprob", text_bigram_logprob, edge, spark)
    ids = {r[0] for r in rows}
    assert 1 not in ids and 2 not in ids  # no bigrams for <2-token docs
    assert {3, 5, 6} <= ids


def test_repetition_short_docs(edge, spark):
    from tweetdb_spark.llm.text import text_repetition

    rows = _parity("text_repetition", text_repetition, edge, spark)
    ids = {r[0] for r in rows}
    assert 1 not in ids and 2 not in ids
    rep = {r[0]: r[4] for r in rows}
    assert rep[5] == 1  # "a a" carries 100% of doc 5's bigram mass


def test_chunk_empty_and_tiny_docs(edge, spark):
    from tweetdb_spark.llm.text import text_chunk

    rows = _parity("text_chunk", text_chunk, edge, spark)
    ids = [r[0] for r in rows]
    assert 1 not in ids  # empty doc emits no chunk on either engine
    assert ids.count(4) == 1  # 1-char doc → exactly one chunk


def test_decontaminate_and_stats_run_on_edge_corpus(edge, spark):
    """The other short-input-sensitive text ops must at least not throw
    (ANSI element_at/sequence classes) on the edge corpus."""
    from tweetdb_spark.llm.text import text_stats, text_unigram_logprob

    t, _ = edge
    assert text_stats(spark, t).count() >= 0
    assert text_unigram_logprob(spark, t).count() > 0


def test_exact_twin_guard_refuses_large_input(spark):
    from pyspark.sql import functions as F

    from tweetdb_spark.guards import exact_twin_input

    big = spark.range(50_001).select(
        F.col("id").alias("s_suppkey"), F.lit("x").alias("s_name")
    )
    with pytest.raises(ValueError, match="GROUND-TRUTH twin"):
        exact_twin_input(big, "fn_levenshtein", "fn_levenshtein_blocked")
    small = spark.range(10).toDF("id")
    assert exact_twin_input(small, "op", "twin") is small
