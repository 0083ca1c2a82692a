import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def q(registry, spark):
    def run(name):
        return registry.QUERIES[name](spark, SF_DIR)

    return run




def test_drift_psi_detects_planted_shift(spark):
    """PSI must be ~0 when both slices share a distribution and large
    when the current slice is shifted — the detection property, on
    planted data (the fixture itself is deliberately driftless)."""
    import datetime

    from pyspark.sql import functions as F

    from tweetdb_spark.operators.analytics import table_drift_psi

    old = datetime.datetime(1997, 1, 1)
    new = datetime.datetime(1999, 1, 1)
    rows = []
    for i in range(2000):
        # baseline: price uniform 0..100, status F/O evenly
        rows.append((i, old, float(i % 100), "F" if i % 2 else "O"))
    for i in range(2000):
        # current: price shifted to 50..150, status all O
        rows.append((10_000 + i, new, 50.0 + (i % 100), "O"))
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate timestamp, o_totalprice double, o_orderstatus string"
    )
    out = {r.col_name: r.psi for r in table_drift_psi(spark, {"orders": df}).collect()}
    assert out["o_totalprice"] > 0.25, out
    assert out["o_orderstatus"] > 0.25, out

    same = spark.createDataFrame(
        [(i, old if i % 2 else new, float(i % 100), "F" if i % 3 else "O")
         for i in range(4000)],
        "o_orderkey long, o_orderdate timestamp, o_totalprice double, o_orderstatus string",
    )
    calm = {r.col_name: r.psi for r in table_drift_psi(spark, {"orders": same}).collect()}
    assert all(v < 0.05 for v in calm.values()), calm


def test_recursive_chain_equals_window_form(registry, spark):
    """Spark's recursive-CTE walk must equal Spark's own window
    closed-form (the oracle already pins it against DuckDB; this pins
    recursion against windows within one engine)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from tests.conftest import SF_DIR
    from tweetdb_spark.catalog import load_tables

    rec = {
        (r.o_orderkey, r.seq, r.cum_spend)
        for r in registry.QUERIES["cte_recursive_chain"](spark, SF_DIR).collect()
    }
    o = load_tables(spark, SF_DIR, ["orders"])["orders"]
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    win = {
        (r.o_orderkey, r.seq, r.cum_spend)
        for r in o.select(
            "o_orderkey",
            F.row_number().over(w).cast("bigint").alias("seq"),
            F.round(
                F.sum("o_totalprice").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                ),
                2,
            ).alias("cum_spend"),
        ).collect()
    }
    assert rec == win and len(rec) > 0


def test_frequent_pairs_on_planted_baskets(spark):
    """Pairs reaching the support threshold survive with the exact
    count; sub-threshold pairs and cross-basket phantom pairs don't."""
    from tweetdb_spark.operators.analytics import itemsets_frequent_pairs

    rows = []
    # parts 1+2 co-occur in orders 0,1,2 (support 3); 1+3 only in order 0
    for o, parts in [(0, [1, 2, 3]), (1, [1, 2]), (2, [1, 2]), (3, [3]), (4, [2])]:
        for p in parts:
            rows.append((o, p))
    li = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    out = {(r.part_a, r.part_b): r.support
           for r in itemsets_frequent_pairs(spark, {"lineitem": li}).collect()}
    assert out == {(1, 2): 3}


def test_multires_rollup_partials_consistent(q):
    """Each resolution's total count must equal the raw event count,
    and week cents must equal the sum of its days' cents — the
    decomposable-aggregate identity the rollup chain relies on."""
    rows = q("events_multires_rollup").collect()
    by_res = {}
    for r in rows:
        acc = by_res.setdefault(r.resolution, [0, 0])
        acc[0] += r.cnt
        acc[1] += r.sum_cents
    assert by_res["hour"] == by_res["day"] == by_res["week"]


def test_bitmap_distinct_merge_lossless(q):
    """The set-union rollup must equal the single-pass distinct on
    every row, and no day can exceed the merged total."""
    rows = q("agg_bitmap_distinct").collect()
    assert rows and all(r.merge_lossless for r in rows)
    assert all(r.n_daily <= r.merged_total == r.direct_total for r in rows)


def test_kmv_exact_below_k_and_bounded_above_k(spark):
    """Sets smaller than k must be estimated EXACTLY (the sketch holds
    every hash); a 2000-member set must land within the documented
    bound; the planted 500-member intersection must be recovered
    within 50%."""
    import datetime

    from tweetdb_spark.operators.aggregates import sketch_kmv_intersect

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # clickers: users 0..1999; purchasers: users 1500..3499 (overlap 500)
    for u in range(2000):
        rows.append((u, base, u, "click", 1.0))
    for u in range(1500, 3500):
        rows.append((10_000 + u, base, u, "purchase", 1.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    r = sketch_kmv_intersect(spark, {"events": df}).collect()[0]
    assert abs(r.est_a - 2000) <= 1000 and abs(r.est_b - 2000) <= 1000
    assert r.exact_intersect == 500
    assert r.within_bound

    # tiny sets: exact
    tiny = spark.createDataFrame(
        [(1, base, 1, "click", 1.0), (2, base, 2, "click", 1.0),
         (3, base, 1, "purchase", 1.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    r2 = sketch_kmv_intersect(spark, {"events": tiny}).collect()[0]
    assert r2.est_a == 2.0 and r2.est_b == 1.0 and r2.est_union == 2.0
    assert r2.est_intersect == 1.0 and r2.exact_intersect == 1


def test_mask_preserves_format_and_distinctness(q):
    """Every masked name keeps the wire format, differs from its
    input, and distinctness is fully preserved (per-position digit
    bijection ⇒ masked data still joins like the original)."""
    import re

    rows = q("mask_format_preserving").collect()
    assert rows and all(r.format_ok and r.changed for r in rows)
    assert all(re.fullmatch(r"Customer#\d{9}", r.name_masked) for r in rows)
    assert len({r.name_masked for r in rows}) == len(rows)


def test_join_cardinality_estimate_bound_holds(q):
    """The sample estimator must land within the documented bound on
    the fixture (deterministic sample — no flake)."""
    r = q("join_cardinality_estimate").collect()[0]
    assert r.within_bound
    assert r.est_rows > 0 and r.exact_rows > 0


def test_listagg_order_is_total_and_deterministic(q):
    """Repeat runs must agree byte-for-byte (total order inside the
    aggregate), and each group's list must actually be sorted."""
    a = {r.nationkey: (r.segs, r.seg_set) for r in q("agg_string_ordered").collect()}
    b = {r.nationkey: (r.segs, r.seg_set) for r in q("agg_string_ordered").collect()}
    assert a == b
    for segs, seg_set in a.values():
        parts = segs.split("|")
        assert parts == sorted(parts)
        dedup = seg_set.split(",")
        assert dedup == sorted(set(parts))


def test_regression_on_planted_trend(spark):
    """A planted exact line value = 2·hour + 5 must come back with
    slope 2, intercept 5, R² = 1; a planted constant must fit slope 0
    with R² 0 (no hallucinated trend)."""
    import datetime

    rows = []
    for h in range(24):
        ts = datetime.datetime(2024, 1, 1, h)
        rows.append((h, ts, 1, "lin", 2.0 * h + 5.0))
        rows.append((100 + h, ts, 1, "flat", 7.0))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    from tweetdb_spark.operators.analytics import agg_regression

    out = {r.event_type: r for r in agg_regression(spark, {"events": df}).collect()}
    assert out["lin"].slope == 2.0 and out["lin"].intercept == 5.0
    assert out["lin"].r2 == 1.0
    assert out["flat"].slope == 0.0 and out["flat"].intercept == 7.0
    assert out["flat"].r2 == 1.0  # zero-variance y: R² defined as 1


def test_pit_join_never_leaks_future_state(q):
    """Intervals partition time per key, so no fact may match more
    than one dimension version — the row-explosion guard (temporal
    correctness itself is oracle-hash-checked)."""
    from collections import Counter

    rows = q("join_pit_scd2").collect()
    assert rows
    per_fact = Counter(r.event_id for r in rows)
    assert max(per_fact.values()) == 1


def test_approx_percentile_within_gk_rank_bound_of_exact(q, tables):
    """agg_approx_percentile's rows-only twin check (r12, verdict ask
    #5): with accuracy=10000 the GK sketch guarantees the returned
    element's rank is within eps=1/accuracy of the requested quantile.
    Assert that rank bound against the raw values per group — a
    distribution-free contract that also holds on edge catalogs
    (NULL values are ignored by both the sketch and the rank count)."""
    from pyspark.sql import functions as F

    vals = {}
    for r in (
        tables["events"]
        .where(F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.sort_array(F.collect_list("value")).alias("v"))
        .collect()
    ):
        vals[r.event_type] = r.v
    eps = 1.0 / 10000 + 1e-9
    got = q("agg_approx_percentile").collect()
    assert {r.event_type for r in got} == set(vals)
    for r in got:
        v = vals[r.event_type]
        n = len(v)
        for quant, x in ((0.5, r.p50_approx), (0.95, r.p95_approx)):
            if n == 0:
                assert x is None
                continue
            le = sum(1 for y in v if y <= x)
            lt = sum(1 for y in v if y < x)
            assert x in v, (r.event_type, quant, x)
            assert le / n >= quant - eps, (r.event_type, quant, x, le, n)
            assert lt / n <= quant + eps, (r.event_type, quant, x, lt, n)


def test_hll_daily_within_error_bound_of_exact(q, tables):
    """agg_hll_daily's rows-only twin check (r12, verdict ask #5):
    every per-(event_type, day) estimate sits within the lgK=14 bound
    of exact countDistinct — NULL days form their own group in both
    forms, NULL user_ids count in neither."""
    from pyspark.sql import functions as F

    exact = {
        (r.event_type, r.day): r.n
        for r in tables["events"]
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    got = {(r.event_type, r.day): r.est_users for r in q("agg_hll_daily").collect()}
    assert set(got) == set(exact)
    for k, n in exact.items():
        if n == 0:
            assert got[k] == 0, (k, got[k])
        else:
            assert abs(got[k] - n) / n < 0.05, (k, got[k], n)
