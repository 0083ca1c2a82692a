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
    python tools/check.py --strict         # driver-sim canonicalizer (see below)
    python tools/check.py --missing-sweep  # keys lacking a committed sweep row
    python tools/check.py --ladder KEY ... # strict at every scale point
    SF_DIR=/root/testdata/sf0.001 python tools/check.py

``--strict`` mirrors the DRIVER's pandas-based canonicalizer rather than
this harness's value-equality one.  The driver materializes both sides as
pandas frames and hashes a repr-sensitive view of the values, which is
stricter than float equality in three ways observed in CORRECTNESS_r01:
  (1) non-scalar cells (array/map/struct) crash pandas factorize
      ("unhashable type: 'numpy.ndarray'") — strict mode fails loudly;
  (2) dtype skew: DuckDB HUGEINT (e.g. window SUM of ints) lands as
      float64 while Spark emits int64 → 1.0 != 1;
  (3) -0.0 vs +0.0 are distinct in a repr hash though equal as floats.
Every hash-checked key must pass BOTH modes before it ships.
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


def register_duck_views(con, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register every fixture table as a DuckDB view over its parquet.

    Shared by check.py and check_sum.py (review r14 — previously
    copy-pasted).  Handles both layouts (driver fixtures are single
    files; Spark-written make_scale.py fixtures are directories of
    part files) and mirrors the catalog's ns-long shim: scaled
    fixtures write events.ts as raw int64 NANOS, which the Spark side
    normalizes but a naive DuckDB view would expose as BIGINT —
    breaking every ts-typed oracle at sf1+.
    """
    for t in tables or TABLES:
        p = f"{sf_dir}/{t}.parquet"
        pat = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{pat}'")
        if t == "events":
            (ts_type,) = con.execute(
                "SELECT typeof(ts) FROM events LIMIT 1"
            ).fetchone()
            if ts_type == "BIGINT":
                con.execute(
                    f"CREATE OR REPLACE VIEW events AS "
                    f"SELECT * REPLACE (make_timestamp(ts // 1000) AS ts) "
                    f"FROM '{pat}'"
                )


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


class NonScalarCell(Exception):
    """A cell the driver's pandas canonicalizer cannot factorize."""


def strict_canon(v):
    """Driver-mimic canonicalization: repr-sensitive, dtype-sensitive.

    Unlike :func:`canon`, this keeps int distinct from float (1 != 1.0),
    keeps -0.0 distinct from +0.0, keeps Decimal distinct from float
    (Spark decimal columns arrive as object-dtype Decimal in pandas while
    DuckDB decimals arrive as float64), and refuses non-scalar cells.
    """
    import numpy as np
    import pandas as pd

    if isinstance(v, (list, tuple, dict, set, np.ndarray)):
        raise NonScalarCell(type(v).__name__)
    if isinstance(v, np.generic):
        v = v.item()
    if v is None or v is pd.NaT:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<null>"  # pandas uses NaN for missing floats
        return "f:" + repr(v)  # repr keeps -0.0 and float-vs-int distinct
    if isinstance(v, bool):
        return "b:" + repr(v)
    if isinstance(v, int):
        return "i:" + repr(v)
    if isinstance(v, Decimal):
        return "dec:" + str(v)
    if isinstance(v, pd.Timestamp):
        return "t:" + (v.tz_localize(None) if v.tzinfo else v).isoformat()
    if isinstance(v, datetime):
        return "t:" + v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return "t:" + datetime(v.year, v.month, v.day).isoformat()
    if isinstance(v, str):
        return "s:" + v
    if isinstance(v, bytes):
        return "y:" + v.hex()
    return "o:" + repr(v)


def strict_multiset(pdf):
    """Multiset of strict-canonicalized rows of a pandas frame (cols
    sorted by name, as the driver does before hashing)."""
    cols = sorted(pdf.columns)
    out = Counter()
    for row in pdf[cols].itertuples(index=False, name=None):
        out[tuple(strict_canon(v) for v in row)] += 1
    return out


def missing_sweep() -> int:
    """Evidence-gap audit: list registered keys with NO row in any
    committed sweep log (sweeps/*.log).  Round 8's end-of-round snapshot
    added three operators whose sweep evidence was never committed; this
    mode makes that class of gap a one-command check instead of a
    judge finding.  Exit 1 if any hash-checked key lacks evidence."""
    import glob
    import re

    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    logs = sorted(glob.glob(os.path.join(here, "sweeps", "*.log")))
    for path in logs:
        with open(path, errors="replace") as fh:
            for m in re.finditer(r"(?:PASS|rows) (\w+):", fh.read()):
                seen.add(m.group(1))
    missing_hash = sorted(k for k in oracles if k not in seen)
    missing_rows = sorted(k for k in qs if k not in oracles and k not in seen)
    print(f"{len(logs)} sweep logs scanned, {len(seen & set(qs))} keys evidenced")
    for k in missing_hash:
        print(f"MISSING (hash) {k}")
    for k in missing_rows:
        print(f"MISSING (rows-only) {k}")
    if not missing_hash and not missing_rows:
        print("all registered keys have committed sweep evidence")
    return 1 if missing_hash else 0


def ladder(keys: list[str]) -> int:
    """Run the given keys in strict mode at every available scale point
    (sf0.001 / sf0.01 / sf0.1, plus /tmp/tweetdb_sf1 if present) via
    one subprocess per SF.  This is the verification pattern every new
    operator goes through before its COVERAGE.md row — three of the
    four r9 bug catches (int64 overflow ×3, IEEE -0.0 drift) were
    reachable at exactly one scale point, which is why one-SF checks
    aren't enough."""
    import subprocess

    if not keys:
        print("usage: check.py --ladder key [key ...]")
        return 2
    # LADDER_DIRS (colon-separated) overrides the default rungs — used
    # by tests and for ad-hoc extra scale points
    rungs = (
        os.environ["LADDER_DIRS"].split(":")
        if os.environ.get("LADDER_DIRS")
        else [
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
            "/tmp/tweetdb_sf1",
            "/tmp/tweetdb_sf3",
        ]
    )
    dirs = [d for d in rungs if os.path.isdir(d)]
    if not dirs:
        # zero scale points means zero checks ran — that must not read
        # as a pass (round-10 verdict: a misconfigured environment was
        # able to sail through the commit gate having verified nothing)
        print("ladder: NO fixture dirs found — nothing was checked", file=sys.stderr)
        return 2
    rc = 0
    for d in dirs:
        print(f"=== {d} ===", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--strict", *keys],
            env={**os.environ, "SF_DIR": d},
        )
        rc = rc or r.returncode
    return rc


def main() -> int:
    import __spark_entry__ as e

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    if "--missing-sweep" in args:
        return missing_sweep()
    if "--ladder" in args:
        return ladder([a for a in args if not a.startswith("--")])
    vanilla = "--vanilla" in args
    strict = "--strict" in args
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
    register_duck_views(con, sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            if strict:
                s_pdf = sdf.toPandas()
                s_rows = list(s_pdf.itertuples(index=False, name=None))
            else:
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
            if strict:
                d_pdf = con.execute(oracles[name]).df()
                d_rows = list(d_pdf.itertuples(index=False, name=None))
            else:
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
            try:
                if strict:
                    sm, dm = strict_multiset(s_pdf), strict_multiset(d_pdf)
                else:
                    sm = rows_multiset(s_cols, s_rows)
                    dm = rows_multiset(d_cols, d_rows)
            except NonScalarCell as ex:
                print(
                    f"FAIL {name}: non-scalar cell ({ex}) — the driver's "
                    f"pandas canonicalizer will crash on this output"
                )
                n_fail += 1
                continue
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
