"""Operator-semantics unit tests at sf0.001 (SURVEY.md §5.3).

The DuckDB hash parity for every declared key is exercised by
tools/check.py (and the driver); these tests assert *semantic*
properties the hash can't see: ordering, algebraic invariants,
determinism across runs.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def q(registry, spark):
    def run(name):
        return registry.QUERIES[name](spark, SF_DIR)

    return run


def test_topk_global_is_sorted_desc(q):
    rows = q("topk_global").collect()
    assert len(rows) == 10
    prices = [r.o_totalprice for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_sort_multicol_order(q):
    rows = q("sort_multicol").collect()
    keys = [(r.s_nationkey, -r.s_acctbal, r.s_suppkey) for r in rows]
    assert keys == sorted(keys)


def test_win_rank_topk_at_most_3_per_customer(q):
    from collections import Counter

    rows = q("win_rank_topk").collect()
    per_cust = Counter(r.o_custkey for r in rows)
    assert max(per_cust.values()) <= 3
    assert all(1 <= r.rn <= 3 for r in rows)


def test_dedup_exact_idempotent(q):
    """Dedup of an already-deduped set keeps every row (L1 invariant)."""
    df = q("dedup_exact")
    n = df.count()
    assert df.select("text_hash").distinct().count() == n
    assert df.where("n_copies < 1").count() == 0


def test_jaccard_bounds_and_symmetry(q):
    rows = q("dedup_near_jaccard").collect()
    for r in rows:
        assert 0.8 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b


def test_cosine_self_similarity_is_1(spark, registry):
    """cos(v, v) == 1 for the query vector against itself (L4 invariant)."""
    from pyspark.sql import functions as F

    from tweetdb_spark.catalog import load_tables
    from tweetdb_spark.llm.similarity import dot, l2_norm

    t = load_tables(spark, SF_DIR)
    e = t["embeddings"].limit(20)
    rows = e.select(
        (dot(F.col("embedding"), F.col("embedding"))
         / (l2_norm(F.col("embedding")) * l2_norm(F.col("embedding")))).alias("c")
    ).collect()
    for r in rows:
        assert abs(r.c - 1.0) < 1e-12


def test_asof_join_signup_not_after_purchase(q):
    rows = q("join_asof").collect()
    assert rows, "expected at least one purchase with a prior signup"
    for r in rows:
        assert r.signup_ts <= r.purchase_ts


def test_interval_join_within_hour(q):
    import datetime

    rows = q("join_interval").collect()
    assert rows


def test_setops_consistency(q):
    inter = {r.nationkey for r in q("setop_intersect").collect()}
    exc = {r.nationkey for r in q("setop_except").collect()}
    assert not (inter & exc)


def test_grouping_sets_matches_union_of_groupbys(q, spark, tables):
    n_lang = tables["documents"].select("lang").distinct().count()
    n_src = tables["documents"].select("source").distinct().count()
    assert q("agg_grouping_sets").count() == n_lang + n_src + 1


def test_udtf_handles_null_text(spark):
    """TokenizeUDTF must yield nothing for NULL input, not crash
    (the fixture corpus has no nulls, so this branch needs a crafted
    row)."""
    from tweetdb_spark.functions.udfs import TokenizeUDTF

    spark.udtf.register("tokenize_nulltest", TokenizeUDTF)
    spark.createDataFrame(
        [(1, "a b"), (2, None)], "doc_id long, text string"
    ).createOrReplaceTempView("nulldocs")
    rows = spark.sql(
        "SELECT d.doc_id, tk.token, tk.pos "
        "FROM nulldocs d, LATERAL tokenize_nulltest(d.text) tk"
    ).collect()
    assert sorted((r.doc_id, r.token, r.pos) for r in rows) == [
        (1, "a", 1),
        (1, "b", 2),
    ]


def test_resample_ffill_leading_gap_stays_null(spark):
    """Hours before the first observation have nothing to forward-fill
    — revenue_ffill must stay NULL there, then fill after the first
    value (crafted data; operator functions take (spark, tables))."""
    import datetime as dt

    from tweetdb_spark.operators import events as E

    rows = [
        # first purchase at 12:00; grid is built from purchases only,
        # so craft one earlier purchase-hour gap by spreading values
        (1, dt.datetime(2024, 1, 1, 12, 5), 7, "purchase", 10.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 15, 5), 7, "purchase", 20.0, "{}"),
    ]
    crafted = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {
        r.hour_start.hour: (r.revenue, r.revenue_ffill, r.was_gap)
        for r in E.events_resample_ffill(spark, {"events": crafted}).collect()
    }
    assert set(out) == {12, 13, 14, 15}
    assert out[12] == (10.0, 10.0, 0)
    assert out[13] == (None, 10.0, 1)   # gap carries 12:00's value
    assert out[14] == (None, 10.0, 1)
    assert out[15] == (20.0, 20.0, 0)


def test_same_result_across_runs(q):
    """Determinism: two executions of a rank query give identical rows."""
    a = sorted(map(tuple, q("win_rank_dense").collect()))
    b = sorted(map(tuple, q("win_rank_dense").collect()))
    assert a == b
