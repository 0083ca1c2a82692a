

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
