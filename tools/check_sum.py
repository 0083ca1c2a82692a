"""Engine-side order-insensitive checksum check — sf1 evidence for
huge-output pair keys where the strict pandas hasher is the bottleneck
(23M rows materialized twice), not the query.

Both engines compute SUM over rows of
    Σ_i ((coalesce(int_col_i, -1) % p) * k_i) % p          (p = 2³¹−1)
entirely inside the engine, so one bigint crosses to the driver per
side.  Column order is sorted-by-name on both sides; double columns
are excluded (their parity is already proven by the sf0.01 full hash —
they are functions of the integer pair columns for every key here).

Usage: SF_DIR=/tmp/tweetdb_sf1 python tools/check_sum.py key [key ...]
"""
from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P = 2147483647
KS = [1315423911, 2654435761, 97, 1000003, 40503, 69621, 214013]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    for t in TABLES:
        path = f"{sf}/{t}.parquet"
        glob = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{glob}'")

    import __spark_entry__ as entry
    from tweetdb_spark.session import get_spark

    spark = get_spark()
    qs, oracles = entry.queries(), entry.oracle_sql()
    fails = 0
    for key in sys.argv[1:]:
        df = qs[key](spark, sf)
        int_cols = sorted(
            f.name
            for f in df.schema.fields
            if f.dataType.simpleString() in ("int", "bigint", "smallint", "boolean")
        )
        assert int_cols, f"{key}: no integer columns to checksum"
        from pyspark.sql import functions as F

        expr = None
        for c, k in zip(int_cols, KS):
            term = (
                (F.coalesce(F.col(c).cast("long"), F.lit(-1)) % P) * k
            ) % P
            expr = term if expr is None else expr + term
        t0 = time.time()
        row = df.agg(
            F.sum(expr).alias("s"), F.count("*").alias("n")
        ).collect()[0]
        t1 = time.time()
        terms = " + ".join(
            f"(((COALESCE(CAST({c} AS BIGINT), -1) % {P}) * {k}) % {P})"
            for c, k in zip(int_cols, KS)
        )
        o = con.execute(
            f"SELECT CAST(SUM({terms}) AS BIGINT) AS s, count(*) AS n "
            f"FROM ({oracles[key]})"
        ).fetchone()
        t2 = time.time()
        ok = (row.s, row.n) == (o[0], o[1])
        fails += 0 if ok else 1
        print(
            f"{'PASS' if ok else 'FAIL'} {key}: cols={int_cols} "
            f"spark=(sum {row.s}, n {row.n}, {t1-t0:.1f}s) "
            f"oracle=(sum {o[0]}, n {o[1]}, {t2-t1:.1f}s)",
            flush=True,
        )
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
