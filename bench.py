"""Benchmark runner — BASELINE.md headline workload.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE COMPACT JSON line as the final
stdout line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...,
   "calibration": ..., "calibration2": ..., "calibrated_total": ...}

ARTIFACT-SIZE CONTRACT (round-10 incident): the driver captures only the
TAIL of stdout (~2000 chars), so the final line must stay well under
that or the artifact records ``parsed: null`` — which is exactly what
round 10's verbose single-line output caused (and round 4 before it).
Everything verbose — per-run samples, methodology, per-query calibrated
values, the vs-prior comparison — goes to ``BENCH_DETAIL.json`` next to
this script (and stderr), never the stdout line.
``tests/test_bench_artifact.py`` asserts the compact line's size.

Timing methodology (self-normalizing since round 8):
- per query: one untimed warm-up execution (plans + JIT warm, matching
  BASELINE.md's warm-run methodology), then THREE timed executions;
  the reported per-query number is the MEDIAN of the three, so a
  single noisy run can't skew the artifact.
- ``calibration``: the median-of-3 time of a FIXED synthetic workload
  (range → modulo keys → groupBy sum/avg over 64M rows) that never
  changes with repo code.  Host-speed swings (the round-7 incident: a
  uniform ~2x degradation that read as a regression until an A/B
  rebench of the prior commit disproved it) show up directly in this
  number, so cross-round BENCH_r*.json comparisons can divide it out
  instead of requiring forensics.
- ``calibration2`` (round-10 verdict ask #6): a SECOND probe shaped
  like the real queries — 1M-row join + window-top-k + groupBy — at
  roughly headline-query duration.  The r10 round showed the single
  64M-row probe is non-linear vs 50-270 ms queries (different
  memory/JIT/IO sensitivity): an unchanged-code round read as a
  uniform ~1.4x calibrated "regression".  Two probes with different
  shapes bracket host drift; a calibrated ratio only indicts code when
  it moves against BOTH.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# name -> registry key (shapes per BASELINE.md "Config")
HEADLINE = {
    "q1_pricing_summary": "agg_grouped",
    "q3_top_orders": "q3_top_orders",
    "q5_region_revenue": "join_multiway",
    "window_rank": "win_rank_topk",
    # attribution twin: same window pipeline, 1-row-per-customer output
    # — the delta vs window_rank isolates result materialization from
    # the custkey shuffle when grading sf-ladder regressions
    "window_rank_agg": "win_rank_topk_agg",
    "events_sessionize": "events_sessionize",
    "events_tumbling": "events_tumbling",
    "json_extract": "fn_map_json",
    # LLM-pipeline headliners: the two operators whose perf matters most
    # at 100 TB.  dedup_minhash_verdicts is the PRODUCTION near-dup form
    # (exact-collapse → LSH on unique reps → components → one verdict
    # row per doc, output LINEAR in corpus size); it replaced the
    # r10-benched pair-list dedup_minhash_lsh, whose output is quadratic
    # on clone-heavy corpora (round-10 verdict ask #2 — the pair list is
    # the documented scale-killer, kept only as small-N oracle ground
    # truth).  The warm-up run absorbs one-time index builds (amortized
    # at scale); timed runs measure the steady-state path.
    "dedup_minhash_verdicts": "dedup_minhash_verdicts",
    "sim_ann_ivf": "sim_ann_ivf",
}

N_RUNS = 3

# Keys whose operator materializes work EAGERLY at query-construction
# time (dedup_minhash_verdicts runs its component fixpoint loop with
# eager localCheckpoints while building the plan): timing only the
# collect() of a pre-built DataFrame would measure a cached re-read
# (~0.06 s for a 36 s pipeline).  These keys rebuild the DataFrame
# inside every timed run.  sim_ann_ivf is NOT here by design: its index
# build is a one-time persisted artifact (amortized at scale); the
# steady-state probe is the production path being measured.
REBUILD_KEYS = {"dedup_minhash_verdicts"}

# r13 (verdict ask #7): heavy keys used to truncate to a single timed
# sample past a 5 s cutoff — which shipped a min-of-2 as the headline
# for dedup_minhash_verdicts in r12.  Every key now gets the full
# N_RUNS timed executions and the reported value is a true median; the
# timed warm-up is appended as a final extra `runs` entry for spread
# evidence but never participates in the median.

# stdout tail budget: the driver keeps ~2000 chars; leave headroom
MAX_COMPACT_LINE = 1500

# keys allowed on the compact stdout line — everything else is detail
COMPACT_KEYS = (
    "metric",
    "value",
    "unit",
    "queries",
    "sf",
    "calibration",
    "calibration2",
    "calibrated_total",
    "fault_mbps",
)


def _fault_probe(mb: int = 64) -> float:
    """First-touch page-fault bandwidth (MB/s) of a fresh anonymous
    allocation — the THIRD host probe (r16 optimization round).

    The r16 sessions isolated a hypervisor-level pathology invisible
    to every in-guest load metric (idle 93%+, steal <5%, MemFree
    121 GiB): the host delivering brand-new pages at 3-9 MB/s while
    recycled pages run at GB/s (sweeps/host_pathology_r16.log).  That
    state inflates cold allocations 2-4x NON-uniformly (the heaviest,
    allocation-richest keys suffer most), which the two compute-shaped
    calibration probes only partially track.  Healthy hosts measure
    ~1000-6000 MB/s here; double-digit values mean every cold-start
    number in the same artifact is suspect.  Runs once, before any
    timing, on a buffer that is freed immediately (so the timed
    queries still see the allocator state they always had)."""
    import time as _time

    try:
        import numpy as np

        t0 = _time.perf_counter()
        a = np.empty(mb * 131072, dtype=np.int64)  # mb MiB
        a[::512] = 1  # touch one word per 4K page
        dt = _time.perf_counter() - t0
        del a
        return round(mb / dt, 1) if dt > 0 else float("inf")
    except Exception:
        return -1.0  # probe must never kill the bench


def _timed_runs(action) -> tuple[float, list[float]]:
    """(median, samples) after one warm-up: N_RUNS timed executions,
    median over exactly those (r13, verdict ask #7 — no heavy-key
    truncation; the r12 artifact presented a min-of-2 as a median).

    The warm-up is itself timed (it is already paid) and appended as
    the LAST entry of `samples` for spread evidence — it may include
    one-time plan/index work for non-rebuild keys, so it never
    participates in the median."""
    t0 = time.time()
    action()
    warm = round(time.time() - t0, 3)
    samples = []
    for _ in range(N_RUNS):
        t0 = time.time()
        action()
        samples.append(round(time.time() - t0, 3))
    med = round(statistics.median(samples), 3)
    return med, samples + [warm]


def _calibration(spark) -> float:
    """Median-of-3 time of a fixed host-speed probe, independent of any
    repo code: 64M-row range → 1000-key modulo groupBy → sum/avg.
    Exercises codegen arithmetic + one exchange + hash aggregation."""
    from pyspark.sql import functions as F

    def run():
        (
            spark.range(0, 64_000_000, 1, 32)
            .withColumn("k", F.col("id") % 1000)
            .groupBy("k")
            .agg(F.sum("id").alias("s"), F.avg("id").alias("a"))
            .collect()
        )

    med, _ = _timed_runs(run)
    return med


def _calibration_joinwin(spark) -> float:
    """Second, QUERY-SHAPED host probe (round-10 verdict ask #6): 1M-row
    fact joined to a 50k-row dim, per-group window top-100, then a
    7-group aggregate — the join/exchange/window/agg mix of the real
    headliners at roughly their duration, still 100% code-independent."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    def run():
        fact = spark.range(0, 1_000_000, 1, 32).withColumn(
            "k", F.col("id") % 50_000
        )
        dim = spark.range(0, 50_000).select(
            F.col("id").alias("k2"), (F.col("id") % 7).alias("lbl")
        )
        w = Window.partitionBy("lbl").orderBy(F.col("id").desc())
        (
            fact.join(dim, F.col("k") == F.col("k2"))
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 100)
            .groupBy("lbl")
            .agg(F.sum("id").alias("s"))
            .collect()
        )

    med, _ = _timed_runs(run)
    return med


def split_artifact(full: dict) -> tuple[dict, dict]:
    """(compact, detail): compact is the driver-facing stdout line —
    ONLY the COMPACT_KEYS — detail is everything, for the sidecar."""
    compact = {k: full[k] for k in COMPACT_KEYS if k in full}
    return compact, full


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import tweetdb_spark
    from tweetdb_spark.session import get_spark

    tweetdb_spark.load_all_operators()
    spark = get_spark("tweetdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    fault_mbps = _fault_probe()
    calibration = _calibration(spark)
    calibration2 = _calibration_joinwin(spark)

    times: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, key in HEADLINE.items():
        # Inter-key isolation (r14, r13 verdict ask #2): a key's timed
        # runs must not inherit the PREDECESSOR's JVM debt.  The r13
        # methodology change (full median-of-3 on heavy keys) 4x'd the
        # dedup work running immediately before sim_ann_ivf, and the
        # ivf samples absorbed its GC/heap churn: in-bench medians
        # 0.13-0.25 s vs 0.05-0.07 s for the same collect() in a quiet
        # process (sweeps/ab_r14_sim_ann_ivf.log).  One explicit full
        # GC + settle between keys is the JMH-fork analogue available
        # inside one session; it measures each key against a level
        # heap instead of the previous key's garbage.
        spark.sparkContext._jvm.System.gc()
        time.sleep(0.5)
        if key in REBUILD_KEYS:
            q = tweetdb_spark.QUERIES[key]
            action = lambda q=q: q(spark, sf_dir).collect()  # noqa: E731
        else:
            df = tweetdb_spark.QUERIES[key](spark, sf_dir)
            action = df.collect
        times[name], runs[name] = _timed_runs(action)

    total = round(sum(times.values()), 3)
    full = {
        "metric": "headline_warm_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calibration": calibration,
        "calibration2": calibration2,
        "fault_mbps": fault_mbps,
        # host-speed-normalized total: divide out the probe so
        # cross-round comparisons self-adjudicate (r7 incident)
        "calibrated_total": round(total / calibration, 3) if calibration else None,
        # per-query host-normalized values (round-9 verdict ask #2): a
        # single-query code regression can't hide behind — or be faked
        # by — host drift when each query self-normalizes
        "calibrated_queries": {
            n: round(t / calibration, 3) for n, t in times.items()
        } if calibration else None,
        "runs": runs,
        "methodology": "median of 3 warm runs per query (every key, no "
        "heavy-key truncation since r13; the final runs[] entry is the "
        "timed warm-up, evidence only, never in the median); "
        "calibration = fixed 64M-row groupBy probe, calibration2 = "
        "fixed 1M-row join+window+agg probe (host-speed normalizers, "
        "code-independent; a calibrated ratio indicts code only when "
        "it moves against BOTH probes); fault_mbps = first-touch "
        "page-fault bandwidth of a fresh 64 MiB allocation, measured "
        "once before any timing (healthy ~1000-6000; double-digit "
        "values flag the r16 host pathology — "
        "sweeps/host_pathology_r16.log); calibrated_total = "
        "value / calibration; vs_prior compares against the newest "
        "BENCH_r*.json present on raw and calibrated axes, per-query "
        "and over the intersection of query sets (comparable_total); "
        "stdout carries ONLY the compact line (driver tail capture is "
        "~2000 chars) — this full object lives in BENCH_DETAIL.json",
    }
    full["vs_prior"] = _vs_prior(times, calibration)

    compact, detail = split_artifact(full)
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh, indent=1)
    print(json.dumps(detail), file=sys.stderr)
    line = json.dumps(compact)
    if len(line) > MAX_COMPACT_LINE:
        # Never ship an overflowing line (the r04/r10 parsed-null class)
        # and never crash with no artifact either: degrade to the
        # minimal driver-required core.  tests/test_bench_artifact.py
        # keeps this branch unreachable for the committed HEADLINE set.
        print(
            f"bench: compact line {len(line)} chars > {MAX_COMPACT_LINE};"
            " emitting minimal core (full object in BENCH_DETAIL.json)",
            file=sys.stderr,
        )
        minimal = {
            k: compact[k]
            for k in ("metric", "value", "unit", "sf", "calibration")
            if k in compact
        }
        line = json.dumps(minimal)
    print(line)


def _vs_prior(times: dict[str, float], calibration: float, root: str | None = None):
    """Round-over-round comparison against the newest BENCH_r*.json
    present in ``root`` (default: the repo root this script lives in),
    in the DETAIL artifact so regressions (or host-speed swings dressed
    as regressions) adjudicate themselves.

    ``root`` is an explicit parameter so tests can point the scan at a
    tmpdir instead of monkeypatching the process-global ``os.path``
    module (r11 ADVICE: the patch window corrupted every dirname caller
    process-wide).

    Because the headline set can change between rounds (r10 added two
    LLM keys; r11 swapped one), totals are compared over the
    INTERSECTION of query names (``comparable_total``); ``raw_ratio``
    is reported ONLY when the two query sets are identical — a
    grown/shrunk set makes the raw total ratio meaningless and it used
    to read as a fake ~11x regression (round-10 ADVICE)."""
    import glob
    import re

    here = root if root is not None else os.path.dirname(os.path.abspath(__file__))
    # strict filename shape: BENCH_r<digits>.json only — a stray
    # BENCH_rerun.json or scratch artifact must not crash (or win) the
    # "newest prior" pick
    priors = sorted(
        (
            p
            for p in glob.glob(os.path.join(here, "BENCH_r*.json"))
            if re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p))
        ),
        key=lambda p: int(
            re.fullmatch(r"BENCH_r(\d+)\.json", os.path.basename(p)).group(1)
        ),
    )
    if not priors:
        return None
    path = priors[-1]
    try:
        with open(path) as fh:
            prior = json.load(fh)
    except Exception as exc:  # artifact unreadable — record why, don't die
        return {"prior": os.path.basename(path), "error": str(exc)}
    # driver artifacts wrap this script's JSON line under "parsed"
    if "parsed" in prior and isinstance(prior["parsed"], dict):
        prior = prior["parsed"]
    if not isinstance(prior, dict) or prior.get("queries") is None:
        # r10-style truncated artifact: no usable prior numbers
        return {"prior": os.path.basename(path), "error": "prior unparsed"}
    total = round(sum(times.values()), 3)
    p_times = prior.get("queries") or {}
    same_set = set(times) == set(p_times)
    cmp = {
        "prior": os.path.basename(path),
        "prior_value": prior.get("value"),
        "prior_sf": prior.get("sf"),
        # only meaningful when the query sets match exactly
        "raw_ratio": (
            round(total / prior["value"], 3)
            if same_set and prior.get("value")
            else None
        ),
    }
    p_cal = prior.get("calibration")
    shared = [n for n in times if n in p_times and p_times[n]]
    if shared:
        comp = round(sum(times[n] for n in shared), 3)
        p_comp = round(sum(p_times[n] for n in shared), 3)
        cmp["comparable_total"] = comp
        cmp["prior_comparable_total"] = p_comp
        cmp["comparable_ratio"] = round(comp / p_comp, 3) if p_comp else None
        cmp["query_ratios"] = {
            n: round(times[n] / p_times[n], 3) for n in shared
        }
        if p_cal and calibration:
            # host-normalized per-query ratios: >1 here on BOTH probes
            # is a CODE regression, not a slow host
            cmp["calibrated_query_ratios"] = {
                n: round((times[n] / calibration) / (p_times[n] / p_cal), 3)
                for n in shared
            }
            cmp["calibrated_comparable_ratio"] = round(
                (comp / calibration) / (p_comp / p_cal), 3
            )
    if same_set and p_cal and prior.get("value") and calibration:
        cmp["prior_calibrated_total"] = round(prior["value"] / p_cal, 3)
        cmp["calibrated_ratio"] = round(
            (total / calibration) / (prior["value"] / p_cal), 3
        )
    return cmp


if __name__ == "__main__":
    main()
