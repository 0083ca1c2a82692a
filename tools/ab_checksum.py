"""Engine-side order-insensitive full-row checksum for A/B refactor
verification (byte-identical-output evidence, as used for the r11
banding rewrite and the r12 component-loop rewrite).

For each key: checksum = SUM(xxhash64(all columns, sorted by name))
as decimal(38,0) — computed entirely in the JVM, one scalar to the
driver.  Columns are hashed in their native binary encoding (raw
xxhash64 input, not a string cast — so e.g. -0.0 and 0.0 hash as the
distinct doubles they are), and any value drift flips the sum.
Compare the printed lines across two
commits; identical lines = identical result multisets.

Usage: SF_DIR=/root/testdata/sf0.1 python tools/ab_checksum.py key [key ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf = os.environ.get("SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entry
    from pyspark.sql import functions as F
    from tweetdb_spark.session import get_spark

    spark = get_spark("ab-checksum")
    qs = entry.queries()
    for key in sys.argv[1:]:
        t0 = time.time()
        df = qs[key](spark, sf)
        cols = sorted(df.columns)
        h = df.select(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("s"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        print(
            f"{key}: rows={h['n']} checksum={h['s']} ({time.time() - t0:.1f}s)",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
