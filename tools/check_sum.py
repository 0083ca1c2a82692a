"""Engine-side order-insensitive checksum check — cheap VALUE evidence
at scale points where the strict pandas hasher is the bottleneck
(23M+ rows materialized twice), not the query.

Both engines compute SUM over rows of
    Σ_i ((coalesce(key_i(col_i), -1) % p) * k_i) % p       (p = 2³¹−1)
entirely inside the engine, so one bigint crosses to the driver per
side.  Column order is sorted-by-name on both sides.  key_i maps a
column to an exact bigint, per type (r14, verdict ask #3 — extended
beyond ints so every contract-core key carries value columns):

  int/bigint/smallint/boolean -> CAST(col AS BIGINT)
  string                      -> octet_length(col)   (UTF-8 bytes)
  timestamp                   -> epoch microseconds
  date                        -> days since 1970-01-01

double/decimal/array/map/struct columns are excluded: FP sums are
order-sensitive and non-scalar cells have no portable bigint map —
their parity is already proven by the sf0.01/sf0.1 full value hash
(tools/check.py), which this tool complements, not replaces.

Usage: SF_DIR=/tmp/tweetdb_sf10 python tools/check_sum.py key [key ...]
       CHECKSUM_TIMEOUT=300 ... python tools/check_sum.py key [key ...]

CHECKSUM_TIMEOUT (seconds, default 0 = none) arms a per-key watchdog —
the Spark job group is cancelled and the DuckDB query interrupted on
expiry, the key prints TIME, and the batch continues (rung_rows'
pattern; lets a wide sweep survive one pathological oracle).
"""
from __future__ import annotations

import os
import sys
import threading
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

P = 2147483647
# enough pairwise-distinct multipliers for the widest contract key
KS = [
    1315423911, 2654435761, 97, 1000003, 40503, 69621, 214013,
    16777619, 31, 131071, 8191, 524287, 2147483629, 65599, 22695477, 1103515245,
]

# type -> (spark bigint mapper, duckdb bigint mapper); both EXACT
_INT_TYPES = ("int", "bigint", "smallint", "boolean")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _mappers(simple_type: str, col: str):
    """(spark_expr, duck_sql) bigint mappers for a column, or None."""
    from pyspark.sql import functions as F

    if simple_type in _INT_TYPES:
        return F.col(col).cast("long"), f"CAST({col} AS BIGINT)"
    if simple_type == "string":
        return (
            F.octet_length(F.col(col)).cast("long"),
            # duckdb strlen = UTF-8 byte count (octet_length is BLOB-only)
            f"CAST(strlen({col}) AS BIGINT)",
        )
    if simple_type == "timestamp":
        return (
            F.unix_micros(F.col(col)),
            f"CAST(epoch_us({col}) AS BIGINT)",
        )
    if simple_type == "date":
        return (
            F.datediff(F.col(col), F.lit("1970-01-01")).cast("long"),
            f"CAST(date_diff('day', DATE '1970-01-01', {col}) AS BIGINT)",
        )
    return None


def main() -> int:
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    con = duckdb.connect()
    con.execute("PRAGMA threads=16")
    from tools.check import register_duck_views

    register_duck_views(con, sf, TABLES)

    import __spark_entry__ as entry
    from tweetdb_spark.session import get_spark

    spark = get_spark()
    qs, oracles = entry.queries(), entry.oracle_sql()
    budget = float(os.environ.get("CHECKSUM_TIMEOUT", "0"))
    fails = 0
    for key in sys.argv[1:]:
        t_key = time.time()
        group = f"checksum-{key}"
        spark.sparkContext.setJobGroup(group, key, interruptOnCancel=True)
        timed_out = threading.Event()
        timer = None
        if budget:
            def _cancel(g=group, ev=timed_out):
                ev.set()
                spark.sparkContext.cancelJobGroup(g)
                try:
                    con.interrupt()
                except Exception:
                    pass

            timer = threading.Timer(budget, _cancel)
            timer.daemon = True
            timer.start()
        try:
            # a completed comparison returns a verdict — a MISMATCH is
            # a returned False, never an exception, so a watchdog that
            # fires just as the query finishes cannot reclassify a
            # genuine value mismatch as TIME (review r14)
            if not _one_key(spark, con, qs, oracles, sf, key):
                fails += 1
        except AssertionError as exc:
            print(f"SKIP {key}: {exc}", flush=True)
        except Exception as exc:
            if timed_out.is_set():
                print(
                    f"TIME {key}: watchdog cancelled after "
                    f"{time.time() - t_key:.1f}s", flush=True,
                )
            else:
                first = (str(exc).strip().splitlines() or ["<no message>"])[0][:200]
                print(f"FAIL {key}: {first}", flush=True)
                fails += 1
        finally:
            if timer is not None:
                timer.cancel()
    return 1 if fails else 0


def _one_key(spark, con, qs, oracles, sf, key) -> bool:
        df = qs[key](spark, sf)
        from pyspark.sql import functions as F

        specs = []  # (name, spark_expr, duck_sql)
        for f in sorted(df.schema.fields, key=lambda f: f.name):
            m = _mappers(f.dataType.simpleString(), f.name)
            if m is not None:
                specs.append((f.name, m[0], m[1]))
        assert specs, f"{key}: no checksummable columns"
        assert len(specs) <= len(KS), f"{key}: widen KS ({len(specs)} cols)"

        expr = None
        duck_terms = []
        for (name, s_expr, d_sql), k in zip(specs, KS):
            term = (F.coalesce(s_expr, F.lit(-1)) % P) * k % P
            expr = term if expr is None else expr + term
            duck_terms.append(f"(((COALESCE({d_sql}, -1) % {P}) * {k}) % {P})")
        # reduce the per-ROW term sum mod P before SUMming (without it
        # the bigint row value overflows at 16 wide columns), and
        # accumulate in DECIMAL(38,0) / HUGEINT: a bigint SUM of
        # row values < P overflows past ~4.3e9 output rows — hit by
        # dedup_containment's 19B pairs at sf10.  Spark's SUM widens a
        # decimal(p,0) input to decimal(p+10,0), so the decimal(28,0)
        # row cast below accumulates in decimal(38,0) — ~1e28 rows x P
        # of headroom (ADVICE r14: the earlier decimal(20,0) cast gave
        # a decimal(30,0) accumulator, ample but narrower than this
        # comment claimed); DuckDB's SUM(BIGINT) is already HUGEINT.
        # Identical arithmetic, wider accumulator — values unchanged.
        expr = (expr % P).cast("decimal(28,0)")
        t0 = time.time()
        row = df.agg(
            F.sum(expr).alias("s"), F.count("*").alias("n")
        ).collect()[0]
        t1 = time.time()
        o = con.execute(
            f"SELECT CAST(SUM(({' + '.join(duck_terms)}) % {P}) AS HUGEINT) AS s, "
            f"count(*) AS n FROM ({oracles[key]})"
        ).fetchone()
        t2 = time.time()
        ok = (
            (None if row.s is None else int(row.s), row.n)
            == (None if o[0] is None else int(o[0]), o[1])
        )
        print(
            f"{'PASS' if ok else 'FAIL'} {key}: cols={[s[0] for s in specs]} "
            f"spark=(sum {row.s}, n {row.n}, {t1-t0:.1f}s) "
            f"oracle=(sum {o[0]}, n {o[1]}, {t2-t1:.1f}s)",
            flush=True,
        )
        return ok


if __name__ == "__main__":
    sys.exit(main())
