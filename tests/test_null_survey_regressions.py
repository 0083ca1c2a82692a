"""Regression lock for the r11 registry-wide NULL survey.

tools/null_survey.py swept every oracle-backed key over a NULL-riddled
fixture catalog and found 7 crashes + 18 semantic divergences, all
fixed in r11 (final sweep: 232/232 PASS).  This test re-runs exactly
the keys that were broken — the full sweep stays a tools-level check
(~5 min); this subset keeps the fixed bug class from regressing at
pytest speed.
"""

from __future__ import annotations

import tempfile

import duckdb
import pytest

from tools.check import rows_multiset
from tools.null_survey import INJECT, KEYCOL, nullify

# every key the r11 survey caught (crash or divergence)
FIXED_KEYS = [
    # crashes
    "dedup_minhash_banded",
    "dedup_incremental_minhash",
    "udf_cogrouped_map",
    "ingest_binary_files",
    "multimodal_features",
    "multimodal_decode_stub",
    "cte_recursive_chain",
    # divergences
    "win_frame_rows",
    "fn_string",
    "ingest_json_corrupt",
    "scan_merge_schema",
    "ingest_xml",
    "join_asof_nearest",
    "sketch_distinct_merge",
    "sketch_quantile_merge",
    "sketch_quantile_grouped",
    "agg_incremental",
    "pandas_api_bridge",
    "win_distribution",
    "agg_mode",
    "value_histogram",
    "mask_format_preserving",
    "fn_aes_roundtrip",
    "corpus_interleave",
    "stream_topk_windowed",
    # round-2 sweep (injection widened to dates, quantities, join keys,
    # n_chars, and embedding vectors)
    "udaf_pandas_agg",
    "win_first_last",
    "win_frame_range",
    "snapshot_time_travel",
    "snapshot_expire",
    "join_incremental",
]


@pytest.fixture(scope="module")
def null_catalog(spark):
    """NULL-riddled copy of the sf0.001 catalog + a DuckDB connection
    over the same parquet, with catalog.load_tables patched to serve
    it (same mechanics as tools/null_survey.py)."""
    import tweetdb_spark.catalog as cat
    import tweetdb_spark.registry as reg

    src = cat.load_tables(spark, "/root/testdata/sf0.001")
    out_dir = tempfile.mkdtemp(prefix="null_regress_")
    con = duckdb.connect()
    paths = {}
    for name, df in src.items():
        if name in INJECT:
            df = nullify(df, INJECT[name], KEYCOL[name])
        p = f"{out_dir}/{name}.parquet"
        paths[name] = p
        df.coalesce(1).write.mode("overwrite").parquet(p)
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}/*.parquet')"
        )

    def patched(spark_arg, _sf, subset=None, *a, **kw):
        d = {}
        for n in list(subset) if subset else list(paths):
            d[n] = spark_arg.read.parquet(paths[n])
            d[n].createOrReplaceTempView(n)
        return d

    orig_cat, orig_reg = cat.load_tables, reg.load_tables
    cat.load_tables = patched
    reg.load_tables = patched
    yield con
    cat.load_tables = orig_cat
    reg.load_tables = orig_reg
    # restore the real temp views for later test modules
    for name, df in src.items():
        df.createOrReplaceTempView(name)


@pytest.mark.parametrize("key", FIXED_KEYS)
def test_fixed_key_matches_oracle_on_null_catalog(key, null_catalog, spark, registry):
    from tweetdb_spark.registry import ordered_queries

    queries, oracles = ordered_queries()
    sdf = queries[key](spark, "/root/testdata/sf0.001")
    s_rows = [tuple(r) for r in sdf.collect()]
    res = null_catalog.execute(oracles[key])
    d_cols = [d[0] for d in res.description]
    d_rows = res.fetchall()
    assert len(s_rows) == len(d_rows), (
        f"{key}: {len(s_rows)} vs {len(d_rows)} rows on the NULL catalog"
    )
    assert rows_multiset(sdf.columns, s_rows) == rows_multiset(d_cols, d_rows), key
