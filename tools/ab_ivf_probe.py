"""Single-process probe for the sim_ann_ivf bench-anchor adjudication
(r13 verdict ask #2: the r13 median 0.131s breached 2x vs the 0.063s
BASELINE.md anchor; runs[] = [0.131, 0.135, 0.076] suggested warm-up
leaking into the first timed samples).

Mirrors bench.py's measurement EXACTLY for this one key — same session
factory, same eager df build outside the timed loop, same
warm-up-then-timed-collects shape — but takes N timed samples (default
8) so the warm-sample split is visible, and prints the fixed
calibration probe so interleaved runs on one host self-normalize.

Usage:  python tools/ab_ivf_probe.py <repo_root> [n_samples]
        (repo_root = the checkout whose tweetdb_spark to import;
         SPARK_GRAFT_SF_DIR honored as in bench.py, default sf0.1)

Prints one JSON line: {"repo": ..., "commit": ..., "calibration": ...,
"samples": [...], "median_all": ..., "median_last3": ...}.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time


def main() -> None:
    repo = os.path.abspath(sys.argv[1])
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    sys.path.insert(0, repo)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import tweetdb_spark
    from tweetdb_spark.session import get_spark

    tweetdb_spark.load_all_operators()
    spark = get_spark("ab-ivf-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    def cal_run():
        (
            spark.range(0, 64_000_000, 1, 32)
            .withColumn("k", F.col("id") % 1000)
            .groupBy("k")
            .agg(F.sum("id").alias("s"), F.avg("id").alias("a"))
            .collect()
        )

    cal_samples = []
    cal_run()  # warm
    for _ in range(3):
        t0 = time.time()
        cal_run()
        cal_samples.append(round(time.time() - t0, 3))
    calibration = round(statistics.median(cal_samples), 3)

    # eager build (index ensure) OUTSIDE the timed loop, as in bench.py
    df = tweetdb_spark.QUERIES["sim_ann_ivf"](spark, sf_dir)
    t0 = time.time()
    df.collect()  # the bench's single warm-up
    warm = round(time.time() - t0, 3)

    samples = []
    for _ in range(n):
        t0 = time.time()
        df.collect()
        samples.append(round(time.time() - t0, 3))

    commit = subprocess.run(
        ["git", "-C", repo, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()
    print(json.dumps({
        "repo": repo,
        "commit": commit,
        "calibration": calibration,
        "warmup": warm,
        "samples": samples,
        "median_all": round(statistics.median(samples), 3),
        "median_first3": round(statistics.median(samples[:3]), 3),
        "median_last3": round(statistics.median(samples[-3:]), 3),
    }))


if __name__ == "__main__":
    main()
