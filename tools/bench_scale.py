"""Time the dedup/ANN scale-path ladder at a given fixture dir.

Usage:  python tools/bench_scale.py [sf_dir] [key ...]

Prints one JSON line {key: sec, ...} — wall clock of ONE warm
construction + count after ONE untimed warm-up construction (r11: the
warm-up absorbs one-time index builds and JIT; the timed run rebuilds
the DataFrame so eagerly-materializing operators are timed honestly;
the sf0.1-vs-sf1 RATIO is what SCALE.md cares about).
Default key set is the LLM-pipeline scale ladder — the operators whose
100 TB viability SCALE.md claims; their quadratic ground-truth twins
are deliberately excluded (size-guarded, and O(n²) would dwarf the
budget at sf1).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

LADDER = [
    "dedup_exact",
    "dedup_simhash",
    "dedup_minhash_banded",
    # dedup_minhash_lsh (pair-emitting) is deliberately NOT on the
    # ladder: on the 10x-cloned sf1 fixture it materializes 297M raw
    # pairs — an output format no production consumer wants (r7: 1428 s,
    # all of it pair materialization at 4.8 µs/pair).  The verdict form
    # below is the production shape (per-doc keep/dup_of); the pair form
    # stays registered + checked at fixture scale (tools/check.py, pytest
    # recall tests) as the ground-truth twin.
    "dedup_minhash_verdicts",
    "dedup_semantic_blocked",
    "sim_topk_cosine",
    "sim_ann_ivf",
    "sim_ann_ivf_pq",
    "sim_ann_lsh",
    "fn_levenshtein_blocked",
    "text_tf_idf",
    "text_quality",
    "corpus_pack",
    "text_dup_ngram_fraction",
    "text_segment_dedup",
    "text_ngram_topk",
    "corpus_sample_stratified",
    "corpus_interleave",
    "corpus_dedup_e2e",
    "corpus_pipeline_audit",
    "embed_project_jl",
    "table_drift_psi",
    "stream_corpus_ingest",
    "stream_vector_ingest",
    "sketch_distinct_merge",
    "sketch_cms_merge",
    "sketch_quantile_merge",
    "sink_jsonl_sharded",
    "join_skewed_fact",
    "cte_recursive_chain",
    "text_bpe_encode",
    "join_asof_forward",
    "join_asof_nearest",
    "subquery_lateral",
    "sketch_quantile_grouped",
    "tweet_filter_track",
    # round-8 late additions
    "text_decontaminate_bloom",
    "text_quality_classifier",
    "itemsets_frequent_pairs",
    "events_multires_rollup",
    "sketch_kmv_intersect",
    "events_gap_islands",
    "win_rolling_quantile",
    "agg_bitmap_distinct",
    "stream_cdc_delete_apply",
    "events_pattern_detect",
    "join_geo_grid",
    "join_pit_scd2",
    "text_entropy",
    "agg_filtered",
    "topk_keyset_page",
    # round-9 additions
    "fn_url_parse",
    "fn_nested_struct",
    "embed_outlier_mean",
    "sim_hybrid_rrf",
    "fn_struct_flatten",
    "agg_multi_distinct_decomposed",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    keys = sys.argv[2:] or LADDER

    import tweetdb_spark
    from tweetdb_spark.session import get_spark

    tweetdb_spark.load_all_operators()
    spark = get_spark("tweetdb-bench-scale")
    spark.sparkContext.setLogLevel("ERROR")

    times: dict[str, float] = {}
    for key in keys:
        # warm construction first (builds any one-time persisted index,
        # warms scans/JIT), then time a FULL reconstruction + count: a
        # few operators materialize work eagerly while BUILDING the
        # DataFrame (dedup_minhash_verdicts runs its component-fixpoint
        # loop with eager localCheckpoints), so timing only count() on
        # a pre-built frame reads a 25 s pipeline as 1.3 s (r11 catch —
        # same blind spot bench.py had).
        tweetdb_spark.QUERIES[key](spark, sf_dir).count()
        t0 = time.time()
        n = tweetdb_spark.QUERIES[key](spark, sf_dir).count()
        times[key] = round(time.time() - t0, 2)
        print(f"  {key}: {times[key]}s ({n} rows)", file=sys.stderr)

    print(json.dumps({"sf_dir": sf_dir, "warm_sec": times}))


if __name__ == "__main__":
    main()
