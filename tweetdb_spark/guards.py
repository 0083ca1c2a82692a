"""Defensive guards for operators that are deliberately non-scalable.

A handful of registered keys are quadratic **ground-truth twins**:
exact all-pairs computations kept as recall/hash oracles for their
bucketed scale siblings (MinHash banding, simhash bands, IVF/LSH,
PassJoin segments).  They are correct at fixture scale and would be
catastrophic at corpus scale, so each one routes its input through
:func:`exact_twin_input`, which fails fast — loudly, before any join
is planned — if someone points it at a large table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Fixture tables are ≤60k rows; anything past this on an all-pairs op
# means someone mistook the ground-truth twin for the scale path.
EXACT_TWIN_MAX_ROWS = 50_000

# Shared stats gate for the bucketed two-pass global-window rewrites
# (corpus_interleave / corpus_token_budget / value_histogram): inputs
# whose catalyst size estimate is below this run the direct
# single-window form, larger inputs the exact bucketed two-pass form.
# One constant (r17, r16 ADVICE: analytics.py had its own str(1 << 25)
# literal that could silently drift from text.py's) — the measured
# crossover evidence lives at text._INTERLEAVE_TWO_PASS_MIN_BYTES's
# original definition comment; per-key env overrides keep both forms
# testable either way.
TWO_PASS_MIN_BYTES = 1 << 25


def exact_twin_input(
    df: DataFrame, op: str, scale_twin: str, limit: int = EXACT_TWIN_MAX_ROWS
) -> DataFrame:
    """Return ``df`` unchanged after asserting it is small enough for an
    O(n²) ground-truth computation.

    ``limit(n+1).count()`` touches at most ``limit+1`` rows, so the
    guard itself stays cheap even against a huge table.
    """
    n = df.limit(limit + 1).count()
    if n > limit:
        raise ValueError(
            f"{op} is an exact all-pairs GROUND-TRUTH twin (O(n²)) and "
            f"refuses inputs over {limit:,} rows (got >{limit:,}). "
            f"Use its scale sibling `{scale_twin}` instead."
        )
    return df
