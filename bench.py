"""Benchmark runner — BASELINE.md headline workload.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

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
- ``runs``: the raw per-query samples, so the artifact itself shows
  run-to-run spread.
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
    # LLM-pipeline headliners (added r10): the two operators whose perf
    # matters most at 100 TB — banded MinHash near-dup over documents and
    # the partition-pruned IVF ANN probe over embeddings.  The warm-up run
    # absorbs the one-time IVF index build (amortized at scale); timed
    # runs measure the steady-state probe/banding path.
    "dedup_minhash_lsh": "dedup_minhash_lsh",
    "sim_ann_ivf": "sim_ann_ivf",
}

N_RUNS = 3


def _timed_runs(action) -> tuple[float, list[float]]:
    """(median, samples) of N_RUNS executions, after one warm-up."""
    action()
    samples = []
    for _ in range(N_RUNS):
        t0 = time.time()
        action()
        samples.append(round(time.time() - t0, 3))
    return round(statistics.median(samples), 3), samples


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


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import tweetdb_spark
    from tweetdb_spark.session import get_spark

    tweetdb_spark.load_all_operators()
    spark = get_spark("tweetdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    calibration = _calibration(spark)

    times: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    for name, key in HEADLINE.items():
        df = tweetdb_spark.QUERIES[key](spark, sf_dir)
        times[name], runs[name] = _timed_runs(df.collect)

    total = round(sum(times.values()), 3)
    out = {
        "metric": "headline_warm_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "calibration": calibration,
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
        "methodology": "median of 3 warm runs per query; "
        "calibration = fixed 64M-row groupBy probe (host-speed "
        "normalizer, code-independent); calibrated_total = "
        "value / calibration; calibrated_queries = per-query "
        "time / calibration; vs_prior compares against the newest "
        "BENCH_r*.json present on raw and calibrated axes, per-query "
        "and over the intersection of query sets (comparable_total)",
    }
    out["vs_prior"] = _vs_prior(times, calibration)
    print(json.dumps(out))


def _vs_prior(times: dict[str, float], calibration: float):
    """Round-over-round comparison against the newest BENCH_r*.json
    present in the repo root, inline in the artifact so regressions (or
    host-speed swings dressed as regressions) adjudicate themselves.

    Because the headline set can grow between rounds (r10 added the two
    LLM keys), totals are compared over the INTERSECTION of query names
    (``comparable_total``); per-query ratios are emitted for every shared
    key on both raw and calibrated axes.
    """
    import glob
    import re

    here = os.path.dirname(os.path.abspath(__file__))
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
    total = round(sum(times.values()), 3)
    cmp = {
        "prior": os.path.basename(path),
        "prior_value": prior.get("value"),
        "prior_sf": prior.get("sf"),
        "raw_ratio": round(total / prior["value"], 3) if prior.get("value") else None,
    }
    p_cal = prior.get("calibration")
    p_times = prior.get("queries") or {}
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
            # host-normalized per-query ratios: >1 here is a CODE
            # regression, not a slow host
            cmp["calibrated_query_ratios"] = {
                n: round((times[n] / calibration) / (p_times[n] / p_cal), 3)
                for n in shared
            }
            cmp["calibrated_comparable_ratio"] = round(
                (comp / calibration) / (p_comp / p_cal), 3
            )
    if p_cal and prior.get("value") and calibration:
        cmp["prior_calibrated_total"] = round(prior["value"] / p_cal, 3)
        cmp["calibrated_ratio"] = round(
            (total / calibration) / (prior["value"] / p_cal), 3
        )
    return cmp


if __name__ == "__main__":
    main()
