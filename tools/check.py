"""Local correctness harness — mirrors the driver's oracle check.

For every key in ``queries()``: run the Spark DataFrame and the DuckDB
oracle SQL on the same sf_dir, then compare
  (1) row count,
  (2) sorted column names,
  (3) order-insensitive multiset of canonicalized row values.

Usage:
    python tools/check.py                  # all keys @ sf0.01
    python tools/check.py agg_grouped ...  # subset
    python tools/check.py --vanilla        # driver-sim: plain SparkSession
    SF_DIR=/root/testdata/sf0.001 python tools/check.py
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(v):
    """Canonicalize a cell for cross-engine comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return float(v)
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    import numpy as np
    if isinstance(v, np.ndarray):
        return tuple(canon(x) for x in v.tolist())
    if isinstance(v, np.generic):
        return canon(v.item())
    return v


def rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(canon(r[i]) for i in order) for r in rows)


def main() -> int:
    import __spark_entry__ as e

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    vanilla = "--vanilla" in args
    only = {a for a in args if not a.startswith("--")}
    qs, oracles = e.queries(), e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd key must fail loudly, not report "0 pass, 0 fail"
        print(f"unknown query keys: {sorted(unknown)}")
        return 2

    if vanilla:
        # driver simulation: a plain session with none of the engine's
        # confs — catalog.configure must make it work anyway
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").appName(
            "tweetdb-check-vanilla"
        ).getOrCreate()
    else:
        from tweetdb_spark.session import get_spark

        spark = get_spark("tweetdb-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            print(f"FAIL {name}: spark error: {ex}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"rows {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as ex:
            print(f"FAIL {name}: duckdb error: {ex}")
            n_fail += 1
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duckdb={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"schema spark={sorted(s_cols)} duckdb={sorted(d_cols)}")
        if not problems:
            sm, dm = rows_multiset(s_cols, s_rows), rows_multiset(d_cols, d_rows)
            if sm != dm:
                diff_s = sm - dm
                diff_d = dm - sm
                ex_s = next(iter(diff_s), None)
                ex_d = next(iter(diff_d), None)
                problems.append(
                    f"values differ ({sum(diff_s.values())} spark-only / "
                    f"{sum(diff_d.values())} duckdb-only)\n"
                    f"    spark-only e.g.: {ex_s}\n    duckdb-only e.g.: {ex_d}"
                )
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
