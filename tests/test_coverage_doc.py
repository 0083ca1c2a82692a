"""COVERAGE.md drift guard.

COVERAGE.md's header states three load-bearing counts (registered keys,
oracle-hash-checked keys, rows-only keys).  They drifted from the
registry for three consecutive rounds before this test existed; now any
key added or removed without updating the doc fails CI at import speed
(no SparkSession needed — the registry is plan-free at import time).
"""

from __future__ import annotations

import os
import re


def _header_counts() -> tuple[int, int, int]:
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "COVERAGE.md")
    with open(path) as fh:
        text = fh.read(2000)
    m = re.search(
        r"(\d+) registered keys: (\d+) oracle-hash-checked.*?(\d+) `rows`-only",
        text,
        re.DOTALL,
    )
    assert m, "COVERAGE.md header counts not found / format changed"
    return tuple(int(g) for g in m.groups())


def _readme_counts() -> tuple[int, int, int]:
    path = os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    with open(path) as fh:
        text = fh.read()
    m = re.search(
        r"(\d+) of (\d+) operator keys are value-hash-verified.*?(\d+) rows-only",
        text,
        re.DOTALL,
    )
    assert m, "README.md oracle-discipline counts not found / format changed"
    hash_n, total, rows = (int(g) for g in m.groups())
    return total, hash_n, rows


def test_readme_counts_match_registry():
    """README.md:~80 drifted in r8 (said 219 of 252 at a 262-key registry);
    guard it the same way as COVERAGE.md so the drift can't recur silently."""
    from tweetdb_spark import registry

    queries, oracles = registry.ordered_queries()
    declared_total, declared_hash, declared_rows = _readme_counts()
    assert declared_total == len(queries), (
        f"README.md says {declared_total} operator keys; "
        f"registry has {len(queries)} — update the Oracle-discipline bullet"
    )
    assert declared_hash == len(oracles), (
        f"README.md says {declared_hash} hash-verified; "
        f"registry has {len(oracles)} oracles — update the bullet"
    )
    assert declared_rows == len(queries) - len(oracles), (
        f"README.md says {declared_rows} rows-only; "
        f"registry implies {len(queries) - len(oracles)} — update the bullet"
    )


def test_coverage_header_matches_registry():
    from tweetdb_spark import registry

    queries, oracles = registry.ordered_queries()
    declared_total, declared_hash, declared_rows = _header_counts()
    assert declared_total == len(queries), (
        f"COVERAGE.md says {declared_total} registered keys; "
        f"registry has {len(queries)} — update the header"
    )
    assert declared_hash == len(oracles), (
        f"COVERAGE.md says {declared_hash} hash-checked; "
        f"registry has {len(oracles)} oracles — update the header"
    )
    assert declared_rows == len(queries) - len(oracles), (
        f"COVERAGE.md says {declared_rows} rows-only; "
        f"registry implies {len(queries) - len(oracles)} — update the header"
    )
