"""Scale-rung completion runner: rows+time evidence for registry keys.

Usage:  python tools/rung_rows.py SF_DIR KEY [KEY ...] [--timeout SECS]

For each key, builds the DataFrame and runs ONE count() under a
watchdog (default 600 s) that cancels the key's Spark job group on
expiry, so a single runaway key can't eat the whole batch.  Prints
one line per key:

    OK    key: N rows (S.Ss)
    FAIL  key: <first line of the error> (S.Ss)
    TIME  key: watchdog cancelled after S.Ss

This is the "OK key: rows (secs)" evidence format of the sf10 rung
logs (sweeps/sf10_r13*.log).  It is deliberately NOT a correctness
check — strict hash-vs-DuckDB coverage lives in tools/check.py; the
rung's job is to prove each key's PLAN survives the scale point at
the default ladder config (8g heap, 32 shuffle partitions) and to
surface the failure classes pytest fixtures are too small to hit
(quadratic pair blow-ups, GC death, fixed constants that should
scale with the corpus).
"""

from __future__ import annotations

import os
import sys
import threading
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    # accept both `--timeout=SECS` and `--timeout SECS` (ADVICE r13:
    # the docstring advertised the space form but only `=` parsed)
    argv = list(sys.argv[1:])
    timeout = 600.0
    args: list[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--timeout"):
            if "=" in a:
                timeout = float(a.split("=", 1)[1])
            else:
                i += 1
                if i >= len(argv):
                    sys.exit("usage: --timeout SECS (missing value)")
                timeout = float(argv[i])
        else:
            args.append(a)
        i += 1
    sf_dir, keys = args[0], args[1:]

    import tweetdb_spark
    from tweetdb_spark.session import get_spark

    tweetdb_spark.load_all_operators()
    spark = get_spark("tweetdb-rung-rows")
    spark.sparkContext.setLogLevel("ERROR")

    n_ok = n_fail = 0
    for key in keys:
        # Inter-key reclamation (r14 sf100 catch — the rung analogue of
        # bench.py's inter-key GC): eager-fixpoint keys localCheckpoint
        # intermediate frames whose storage blocks stay pinned until
        # the DRIVER-side RDD objects are garbage-collected and the
        # ContextCleaner unpersists them.  Without this, running
        # corpus_dedup_e2e before corpus_negative_pairs at the sf100
        # rung carried ~checkpoint-sized executor heap into the next
        # key and OOM-killed the JVM, failing the rest of the batch.
        import gc

        gc.collect()
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:  # noqa: BLE001 — best-effort
            pass
        time.sleep(0.5)
        group = f"rung-{key}"
        spark.sparkContext.setJobGroup(group, key, interruptOnCancel=True)
        timed_out = threading.Event()

        def cancel(g=group, ev=timed_out):
            ev.set()
            spark.sparkContext.cancelJobGroup(g)
            # availableNow streaming queries execute on their own
            # threads OUTSIDE the caller's job group — cancelling the
            # group alone leaves the stream running and eating task
            # slots for the rest of the batch (observed: a cancelled
            # stream_dedup stage kept 7 running tasks through the
            # next three keys).  Stop every active stream too; rung
            # keys run one at a time so there is nothing else to hit.
            try:
                for q in spark.streams.active:
                    q.stop()
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass

        watchdog = threading.Timer(timeout, cancel)
        watchdog.start()
        t0 = time.time()
        try:
            n = tweetdb_spark.QUERIES[key](spark, sf_dir).count()
            dt = time.time() - t0
            if timed_out.is_set():
                # a stopped availableNow stream makes run_to_memory
                # return a PARTIAL memory table that counts "fine" —
                # the first batch-E run printed stream_rate_limit as
                # OK with half its rows this way
                print(
                    f"TIME  {key}: watchdog fired; partial result "
                    f"{n} rows ({dt:.1f}s)",
                    flush=True,
                )
                n_fail += 1
            else:
                print(f"OK    {key}: {n} rows ({dt:.1f}s)", flush=True)
                n_ok += 1
        except Exception as e:  # noqa: BLE001 — rung must survive any key
            dt = time.time() - t0
            if timed_out.is_set():
                print(f"TIME  {key}: watchdog cancelled after {dt:.1f}s", flush=True)
            else:
                first = str(e).strip().splitlines()
                first = first[0][:300] if first else type(e).__name__
                print(f"FAIL  {key}: {first} ({dt:.1f}s)", flush=True)
                traceback.print_exc(file=sys.stderr)
            n_fail += 1
            # A GC-death leaves the JVM half-alive: every later key
            # then FAILs in <1s with opaque RPC errors (the sf100
            # first pass logged 19 such cascade FAILs after one real
            # one).  Probe the session; if it's dead, abort loudly so
            # the caller reruns the remainder fresh instead of
            # recording noise.
            try:
                spark.sql("select 1").collect()
            except Exception:
                print(
                    f"DEAD  session unusable after {key}; "
                    f"aborting — rerun remaining keys fresh",
                    flush=True,
                )
                sys.exit(2)
        finally:
            watchdog.cancel()
            spark.sparkContext.setJobGroup("", "")
            # Session hygiene between keys: run_to_memory's contract
            # (streaming/sources.py) says loops over many streams must
            # drop the per-query memory-sink tables — at sf10 each one
            # pins up to ~10M driver-heap rows, and 200 keys of
            # accumulation turned a 42 s standalone stream_dedup into
            # a 600 s watchdog kill (GCLocker thrash) in the first
            # batch-E run.  clearCache drops any per-key cached frames
            # the same way.
            try:
                spark.catalog.clearCache()
                for tb in spark.catalog.listTables():
                    if tb.isTemporary and tb.name.startswith("mem_"):
                        spark.catalog.dropTempView(tb.name)
            except Exception:  # noqa: BLE001 — best-effort cleanup
                pass

    print(f"{n_ok} ok, {n_fail} fail/timeout", flush=True)
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
