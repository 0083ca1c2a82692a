"""Scan / sink side-effect semantics (file layout assertions that the
oracle hash can't see — the hash proves content, these prove files)."""

from __future__ import annotations

import glob

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def q(registry, spark):
    def run(name):
        return registry.QUERIES[name](spark, SF_DIR)

    return run


def test_compact_files_reduces_file_count(q):
    """The compaction rewrite must actually shrink the file count; the
    oracle hash already proves losslessness."""
    from tweetdb_spark import scratch

    q("compact_files").collect()
    frags = scratch.own_dirs("tweetdb_frag")
    compacts = scratch.own_dirs("tweetdb_compact")
    assert frags and compacts
    n_frag = len(glob.glob(f"{frags[-1]}/*.parquet"))
    n_compact = len(glob.glob(f"{compacts[-1]}/*.parquet"))
    assert n_compact <= 4 < n_frag
