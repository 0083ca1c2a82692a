

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
