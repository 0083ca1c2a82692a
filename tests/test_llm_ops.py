"""LLM-pipeline operator semantics (dedup tiers, ANN, multimodal).

The oracle hash checks prove value parity; these assert the
*relationships between* operators — the approximate tiers must agree
with their exact ground-truth twins.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def q(registry, spark):
    def run(name):
        return registry.QUERIES[name](spark, SF_DIR)

    return run


def test_ann_ivf_recall_vs_exact(q):
    """IVF probing 8/16 cells must recover most of the exact top-10."""
    exact = [r.vec_id for r in q("sim_topk_cosine").collect()]
    approx = {r.vec_id for r in q("sim_ann_ivf").collect()}
    recall = len(set(exact) & approx) / len(exact)
    assert recall >= 0.5, f"recall@10 = {recall} (exact={exact}, approx={approx})"


def test_ann_ivf_fit_amortized_out_of_query_path(q, monkeypatch):
    """After the first invocation builds the index, repeat queries must
    run NO KMeans fit — the 100 TB contract is fit-once/query-many,
    like the bucketed join tables."""
    import pyspark.ml.clustering as C

    q("sim_ann_ivf").collect()  # cold call: builds + caches the index

    def _no_fit(self, *a, **kw):  # pragma: no cover - failure path
        raise AssertionError("KMeans.fit invoked on the warm query path")

    monkeypatch.setattr(C.KMeans, "fit", _no_fit)
    assert len(q("sim_ann_ivf").collect()) == 10


def test_ann_lsh_probe_prunes_partitions(q):
    """The LSH probe must be a parquet partition-pruned read of the
    (j, band) buckets it names — never a scan of the signature table."""
    df = q("sim_ann_lsh")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    frag = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "j#" in frag and "band#" in frag, plan


def test_ann_lsh_index_amortized(q):
    """Repeat LSH queries must reuse the persisted band-partitioned
    index, not rewrite it (mtime-stable across warm calls; shared by
    multiprobe)."""
    import os

    from tweetdb_spark.llm import similarity as S

    q("sim_ann_lsh").collect()  # cold call builds + caches
    path = next(iter(S._LSH_CACHE.values()))
    mtime = os.path.getmtime(path)
    assert len(q("sim_ann_lsh").collect()) == 10
    assert len(q("sim_ann_multiprobe").collect()) == 10
    assert os.path.getmtime(path) == mtime  # no rewrite, shared index


def test_ann_ivf_probe_prunes_partitions(q):
    """The probe filter must reach the scan as PartitionFilters on
    ``cell`` — the parquet-level pruning that makes an 8/16-cell probe
    read 8/16ths of the bytes at any scale."""
    df = q("sim_ann_ivf")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    frag = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "cell" in frag, plan


def test_minhash_lsh_finds_jaccard_pairs(q):
    """LSH candidates (dist ≤ 0.2 ⇒ jaccard ≥ 0.8) must cover most
    exact token-set Jaccard ≥ 0.8 pairs, and never emit a pair the
    exact twin lacks (the verify filter is exact)."""
    exact = {(r.doc_a, r.doc_b) for r in q("dedup_near_jaccard").collect()}
    lsh = {(r.doc_a, r.doc_b) for r in q("dedup_minhash_lsh").collect()}
    assert exact, "ground-truth pair set is empty"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall = {recall}"
    assert not lsh - exact, "LSH emitted a pair the exact twin lacks"


def test_minhash_lsh_recall_not_below_ml_tier(q, spark, tables):
    """Cross-check the banded L3 against Spark ML's MinHashLSH (the
    pre-r7 implementation, retained here as the reference tier): at the
    same 0.2-distance threshold the banded pipeline's recall vs the
    exact quadratic ground truth must not fall below the ML tier's.

    8 bands × 2 rows gives pair-recall 1-(1-s²)^8, which dominates the
    ML config's 5 single-row tables (1-(1-s)^5) for every s ≥ 0.8 —
    this test pins that inequality on real data.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer
    from pyspark.sql import functions as F

    exact = {(r.doc_a, r.doc_b) for r in q("dedup_near_jaccard").collect()}
    assert exact, "ground-truth pair set is empty"
    banded = {(r.doc_a, r.doc_b) for r in q("dedup_minhash_lsh").collect()}

    # the ML reference tier's Tokenizer NPEs on NULL text; the engine
    # drops NULL-text docs from candidates (no tokens → no bands), so
    # the reference must see the same doc population
    docs = tables["documents"].select("doc_id", "text").where("text IS NOT NULL")
    tf = HashingTF(
        inputCol="words", outputCol="features", numFeatures=1 << 12, binary=True
    ).transform(
        Tokenizer(inputCol="text", outputCol="words").transform(docs)
    )
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=5, seed=42
    ).fit(tf)
    ml_pairs = {
        (r.doc_a, r.doc_b)
        for r in model.approxSimilarityJoin(tf, tf, 0.2, distCol="d")
        .where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
        )
        .collect()
    }
    r_banded = len(exact & banded) / len(exact)
    r_ml = len(exact & ml_pairs) / len(exact)
    assert r_banded >= r_ml, f"banded recall {r_banded} < ML tier {r_ml}"


def test_minhash_lsh_scale_cap_is_topk_of_exact(q, registry, spark, monkeypatch):
    """Above _LSH_EXACT_PAIRS_MAX_DOCS the pair key emits a per-doc
    nearest-neighbor sample (verdict ask #8, r13): same schema, output
    linear in corpus size.  Forcing the threshold to 0 on the fixture,
    the capped output must be exactly the per-doc_a top-K of the exact
    pair list (jaccard_dist ASC, doc_b tiebreak) — and with K large it
    must equal the exact list, proving the cap is the ONLY difference."""
    from tweetdb_spark.llm import dedup as D

    exact = q("dedup_minhash_lsh").collect()
    by_a = {}
    for r in exact:
        by_a.setdefault(r.doc_a, []).append(r)
    k = 2
    want = {
        (r.doc_a, r.doc_b, r.jaccard_dist)
        for rows in by_a.values()
        for r in sorted(rows, key=lambda r: (r.jaccard_dist, r.doc_b))[:k]
    }
    monkeypatch.setattr(D, "_LSH_EXACT_PAIRS_MAX_DOCS", 0)
    monkeypatch.setattr(D, "_LSH_PAIRS_PER_DOC", k)
    got = {
        (r.doc_a, r.doc_b, r.jaccard_dist)
        for r in q("dedup_minhash_lsh").collect()
    }
    assert got == want
    monkeypatch.setattr(D, "_LSH_PAIRS_PER_DOC", 10**9)
    full = {
        (r.doc_a, r.doc_b, r.jaccard_dist)
        for r in q("dedup_minhash_lsh").collect()
    }
    assert full == {(r.doc_a, r.doc_b, r.jaccard_dist) for r in exact}


def test_minhash_verdicts_single_exchange_equals_two_level(
    registry, spark, monkeypatch
):
    """r17 optimization round: the single-exchange member collapse
    (engaged below the shared 32 MiB stats gate) must be row-identical
    to the two-level md5-then-token-set collapse — the token-set
    partition is a coarsening of the md5 partition, so the member
    min-window reproduces the two-level ts_rep exactly.  Counter
    multiset (NULL-safe, no sorted())."""
    from collections import Counter

    key = "dedup_minhash_verdicts"
    monkeypatch.setenv("TWEETDB_VERDICTS_TWO_LEVEL_MIN_BYTES", str(1 << 60))
    single = Counter(map(tuple, registry.QUERIES[key](spark, SF_DIR).collect()))
    monkeypatch.setenv("TWEETDB_VERDICTS_TWO_LEVEL_MIN_BYTES", "0")
    two = Counter(map(tuple, registry.QUERIES[key](spark, SF_DIR).collect()))
    assert single == two


def test_minhash_verdicts_consistent_with_pair_form(q, tables):
    """The verdict form (per-doc keep/dup_of) must agree with the
    pair-emitting L3 on the same fixture: every pair's endpoints land
    in one component, exactly one keeper per component, singletons
    keep, and reason codes match the keeper's hash.  This pins the
    exact-collapse-then-LSH-on-uniques path to the pair form's
    connectivity (the collapse provably preserves it: clones share
    their representative's token set and band signatures)."""
    from collections import Counter

    verdicts = q("dedup_minhash_verdicts").collect()
    pairs = q("dedup_minhash_lsh").collect()
    n_docs = tables["documents"].count()
    assert len(verdicts) == n_docs, "one verdict row per document"

    comp = {r.doc_id: r.component_id for r in verdicts}
    assert not [
        (p.doc_a, p.doc_b) for p in pairs if comp[p.doc_a] != comp[p.doc_b]
    ], "a verified near-dup pair was split across components"

    keepers = Counter(r.component_id for r in verdicts if r.keep)
    assert set(keepers) == set(comp.values()), "component without a keeper"
    assert all(v == 1 for v in keepers.values()), "multiple keepers"

    sizes = Counter(comp.values())
    assert all(
        r.keep for r in verdicts if sizes[r.component_id] == 1
    ), "a singleton doc was dropped"
    assert all((r.reason == "kept") == bool(r.keep) for r in verdicts)
    # exact_dup iff byte-identical to the keeper
    text_h = {
        r.doc_id: r.h
        for r in tables["documents"]
        .selectExpr("doc_id", "md5(text) AS h")
        .collect()
    }
    for r in verdicts:
        if not r.keep:
            same = text_h[r.doc_id] == text_h[r.keep_doc_id]
            assert (r.reason == "exact_dup") == same, r


def test_simhash_pairs_are_discriminative(q, spark, tables):
    """SimHash must *rank* similarity: candidate pairs more similar
    than random pairs, and hamming-0 pairs nearly identical.

    (On this fixture the 31-word shared vocabulary makes even random
    pairs overlap heavily — tf-cosine ≈ 0.62 — so the invariant is the
    ordering, not an absolute threshold.)
    """
    import random
    from collections import Counter

    rows = q("dedup_simhash").collect()
    assert rows, "no simhash candidates"
    docs = {
        r.doc_id: Counter(r.text.split(" "))
        for r in tables["documents"].select("doc_id", "text").collect()
    }

    def tf_cosine(a, b):
        ca, cb = docs[a], docs[b]
        num = sum(ca[k] * cb[k] for k in ca)
        da = sum(v * v for v in ca.values()) ** 0.5
        db = sum(v * v for v in cb.values()) ** 0.5
        return num / (da * db)

    cand = [tf_cosine(r.doc_a, r.doc_b) for r in rows]
    mean_cand = sum(cand) / len(cand)

    random.seed(7)
    ids = list(docs)
    rnd = [tf_cosine(*random.sample(ids, 2)) for _ in range(300)]
    mean_rnd = sum(rnd) / len(rnd)
    assert mean_cand > mean_rnd + 0.05, (mean_cand, mean_rnd)

    exact = [tf_cosine(r.doc_a, r.doc_b) for r in rows if r.hamming == 0]
    if exact:
        assert sum(exact) / len(exact) >= 0.9


def test_cluster_resolution_converges_on_long_chains(spark):
    """Regression: path graphs must collapse to ONE component with
    every node labelled by the chain minimum — asserted against the
    SHARED helper (_min_label_components), not an inlined copy of it.

    Two probes: the 59-hop chain that killed a fixed-iteration-cap
    variant (plain min-label propagation moves one hop per round), and
    the 4-node path 1-2-3-4 that exposed the r12 edge-contraction exit
    bug (the contracted frame emptied while node 4 still held the
    stale pointer 2 -> component 2 instead of 1)."""
    from pyspark.sql import functions as F

    from tweetdb_spark.llm.dedup import _min_label_components

    for n in (4, 60):
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "u long, v long"
        )
        nodes = spark.range(n).select(F.col("id").alias("doc_id"))
        out = _min_label_components(nodes, edges).collect()
        assert len(out) == n
        bad = {r.doc_id: r.component_id for r in out if r.component_id != 0}
        assert not bad, f"n={n}: stale labels {bad}"


def test_local_and_distributed_components_agree(spark, monkeypatch):
    """The r15 size-gated local path and the distributed
    contraction/doubling loop must produce the identical labelling on
    graphs exercising chains (pointer depth), cliques, isolated nodes,
    multi-component mixes, and non-contiguous ids.  Forcing the
    threshold to -1 routes the SAME helper through the distributed
    loop; the unique-min-label partition makes the outputs comparable
    row for row."""
    from pyspark.sql import functions as F

    from tweetdb_spark.llm import dedup as D

    edge_rows = (
        [(i, i + 1) for i in range(0, 10)]          # chain 0-10
        + [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
        + [(1000, 2000), (2000, 3000), (500, 3000)]  # sparse far ids
    )
    edges = spark.createDataFrame(edge_rows, "u long, v long")
    nodes = spark.createDataFrame(
        [(i,) for i in (
            list(range(0, 11)) + list(range(100, 105))
            + [500, 1000, 2000, 3000, 7777]          # 7777 isolated
        )],
        "doc_id long",
    )
    local = sorted(
        (r.doc_id, r.component_id)
        for r in D._min_label_components(nodes, edges).collect()
    )
    monkeypatch.setattr(D, "_LOCAL_COMPONENTS_MAX_EDGES", -1)
    dist = sorted(
        (r.doc_id, r.component_id)
        for r in D._min_label_components(nodes, edges).collect()
    )
    assert local == dist
    comp = dict(local)
    assert comp[7777] == 7777 and comp[10] == 0 and comp[104] == 100
    assert comp[3000] == 500 and comp[1000] == 500


def test_semantic_blocked_recall_vs_exact(q):
    """Cell-blocked semantic dedup: every emitted pair must be real
    (exact cosine filter ⇒ zero false positives) and recall vs the
    all-pairs twin must stay high with 2-cell probing."""
    exact = {(r.vec_a, r.vec_b) for r in q("dedup_embedding_cosine").collect()}
    blocked = {(r.vec_a, r.vec_b) for r in q("dedup_semantic_blocked").collect()}
    assert not blocked - exact, "blocked emitted a pair the exact twin lacks"
    if exact:
        recall = len(exact & blocked) / len(exact)
        assert recall >= 0.6, f"recall {recall}"


def test_fingerprint_unique_on_unique_corpus(q, tables):
    """The fixture corpus has no exact dupes → every fingerprint group
    should have n_docs == 1 (and as many groups as docs)."""
    rows = q("doc_fingerprint").collect()
    assert sum(r.n_docs for r in rows) == tables["documents"].count()


def test_multimodal_decode_stub_invariants(q):
    rows = q("multimodal_decode_stub").collect()
    for r in rows:
        assert 16 <= r.width < 80 and 16 <= r.height < 80
        assert 1 <= r.n_frames <= 7
        assert r.resized_w == r.width // 2
        # frame_idx is '|'-serialized (scalar wire format; see
        # DECODED_SCHEMA note in llm/multimodal.py)
        assert r.frame_idx == "|".join(str(i) for i in range(0, r.n_frames, 2))


def test_multimodal_decode_real_path_is_gated():
    """decode_image must fail loudly (NotImplementedError), never
    silently fall back, when codec libs are absent."""
    from tweetdb_spark.llm.multimodal import decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_quality_ratios_bounded(q):
    for r in q("text_quality").collect():
        assert 0 < r.distinct_ratio <= 1
        assert 0 <= r.stopword_ratio <= 1
        assert r.quality_pass in (0, 1)


def test_lang_id_deterministic_and_total(q, tables):
    rows = q("text_lang_id").collect()
    assert len(rows) == tables["documents"].count()
    assert all(r.pred_lang in {"en", "de", "es", "fr", "zh", "und"} for r in rows)


def test_pairwise_sampled_converges_to_exact(q):
    """The stratified 50% sample's mean-cosine estimate must sit close
    to the exact all-pairs statistic, for both the intra- and
    inter-label groups (estimator convergence, not value parity —
    value parity is the oracle hash check)."""
    exact = {r.same_label: r for r in q("sim_pairwise_label").collect()}
    sampled = {r.same_label: r for r in q("sim_pairwise_label_sampled").collect()}
    assert set(sampled) == set(exact) == {0, 1}
    for k in (0, 1):
        assert abs(sampled[k].mean_cos - exact[k].mean_cos) < 0.05
        # ~half the vectors per stratum -> ~quarter the pairs
        assert 0.15 < sampled[k].n_pairs / exact[k].n_pairs < 0.35


def test_minhash_banded_recall_vs_exact(q):
    """The portable banded MinHash must recover the exact quadratic
    twin's pairs on the fixture (near-dups here are ~0.9 similar, so
    expected recall 1-(1-s^4)^4 ~ 0.99), and can never emit a pair
    below the verify threshold."""
    exact = {(r.doc_a, r.doc_b) for r in q("dedup_ngram_jaccard").collect()}
    banded = {(r.doc_a, r.doc_b): r.ngram_jaccard
              for r in q("dedup_minhash_banded").collect()}
    assert exact, "fixture must contain near-dup documents"
    recall = len(exact & set(banded)) / len(exact)
    assert recall >= 0.75
    assert set(banded) <= exact  # verify step forbids false positives
    assert all(j >= 0.7 for j in banded.values())


def test_minhash_banded_scale_branch_equals_exact(q, registry, spark, monkeypatch):
    """Above _LSH_EXACT_PAIRS_MAX_DOCS dedup_minhash_banded switches to
    the collapse-before-shingles scale branch + bounded per-doc_a
    top-K expansion (r13 verdict ask #5).  Forcing the threshold to 0
    on the fixture: with K large the scale branch must reproduce the
    sub-threshold exact pair list bit-for-bit (proving the branch
    itself introduces nothing), and with K small it must equal the
    per-doc_a top-K of the exact list under the oracle's ordering
    (ngram_jaccard DESC, doc_b ASC)."""
    from tweetdb_spark.llm import dedup as D

    exact = q("dedup_minhash_banded").collect()
    assert exact, "fixture must contain near-dup documents"
    monkeypatch.setattr(D, "_LSH_EXACT_PAIRS_MAX_DOCS", 0)
    monkeypatch.setattr(D, "_LSH_PAIRS_PER_DOC", 10**9)
    full = {(r.doc_a, r.doc_b, r.ngram_jaccard)
            for r in q("dedup_minhash_banded").collect()}
    assert full == {(r.doc_a, r.doc_b, r.ngram_jaccard) for r in exact}
    k = 2
    by_a = {}
    for r in exact:
        by_a.setdefault(r.doc_a, []).append(r)
    want = {
        (r.doc_a, r.doc_b, r.ngram_jaccard)
        for rows in by_a.values()
        for r in sorted(rows, key=lambda r: (-r.ngram_jaccard, r.doc_b))[:k]
    }
    monkeypatch.setattr(D, "_LSH_PAIRS_PER_DOC", k)
    got = {(r.doc_a, r.doc_b, r.ngram_jaccard)
           for r in q("dedup_minhash_banded").collect()}
    assert got == want


def test_semantic_blocked_cap_branch_equals_exact(q, monkeypatch):
    """Above _LSH_EXACT_PAIRS_MAX_DOCS valid vectors
    dedup_semantic_blocked switches its member-pair expansion to the
    bounded per-vec_a top-K form (r15, r14 verdict ask #2).  Forcing
    the threshold to 0 on the fixture: with K large the capped branch
    must reproduce the exact pair list bit-for-bit, and with K small
    it must equal the per-vec_a top-K of the exact list under the
    capped form's ordering (cos_sim DESC, vec_b ASC).  Everything
    upstream of the expansion (quantizer, blocking, gram verify) is
    shared between branches, so any difference is the expansion's."""
    from tweetdb_spark.llm import dedup as D

    exact = q("dedup_semantic_blocked").collect()
    assert exact, "fixture must contain semantic near-dup vectors"
    monkeypatch.setattr(D, "_LSH_EXACT_PAIRS_MAX_DOCS", 0)
    monkeypatch.setattr(D, "_LSH_PAIRS_PER_DOC", 10**9)
    full = {(r.vec_a, r.vec_b, r.cos_sim)
            for r in q("dedup_semantic_blocked").collect()}
    assert full == {(r.vec_a, r.vec_b, r.cos_sim) for r in exact}
    k = 2
    by_a = {}
    for r in exact:
        by_a.setdefault(r.vec_a, []).append(r)
    want = {
        (r.vec_a, r.vec_b, r.cos_sim)
        for rows in by_a.values()
        for r in sorted(rows, key=lambda r: (-r.cos_sim, r.vec_b))[:k]
    }
    monkeypatch.setattr(D, "_LSH_PAIRS_PER_DOC", k)
    got = {(r.vec_a, r.vec_b, r.cos_sim)
           for r in q("dedup_semantic_blocked").collect()}
    assert got == want


def test_np_kmeans_deterministic_and_total():
    """The driver-side quantizer (r15) must be byte-deterministic for
    a given (X, k, seed) — the whole point of replacing the MLlib fit
    — assign every training point a finite center, handle k > n and
    duplicate-heavy inputs (empty cells keep their previous center),
    and move with the seed."""
    import numpy as np

    from tweetdb_spark.llm.dedup import _np_kmeans

    rng = np.random.RandomState(7)
    X = np.vstack([
        rng.normal(0, 1, (500, 16)),
        rng.normal(8, 1, (500, 16)),
        np.tile(rng.normal(-8, 1, (1, 16)), (200, 1)),  # clone block
    ])
    a = _np_kmeans(X, 6, seed=42)
    b = _np_kmeans(X, 6, seed=42)
    assert a.shape == (6, 16) and a.tobytes() == b.tobytes()
    c = _np_kmeans(X, 6, seed=43)
    assert c.tobytes() != a.tobytes()
    assert np.isfinite(a).all()
    # k > n degrades to n centers, never crashes
    small = _np_kmeans(X[:3], 8, seed=42)
    assert small.shape == (3, 16) and np.isfinite(small).all()
    # all-identical input: one live center at the point, rest parked
    dup = _np_kmeans(np.tile(X[:1], (50, 1)), 4, seed=42)
    assert np.isfinite(dup).all()
    assert np.allclose(dup[0], X[0]) or any(
        np.allclose(dup[i], X[0]) for i in range(len(dup))
    )


def test_np_kmeans_nonfinite_rows_filtered_not_fatal():
    """r16 ADVICE: a NaN/Inf ELEMENT inside an embedding (which
    _valid_embeddings does not screen — it only drops NULL/empty
    vectors) must not poison the D² seeding probabilities.  Rows with
    non-finite elements are dropped from the training sample; an
    all-non-finite sample raises a clear ValueError, not numpy's
    'probabilities contain NaN'."""
    import numpy as np
    import pytest

    from tweetdb_spark.llm.dedup import _np_kmeans

    rng = np.random.RandomState(7)
    X = rng.normal(0, 1, (200, 8))
    Xbad = X.copy()
    Xbad[3, 2] = np.nan
    Xbad[17, 0] = np.inf
    got = _np_kmeans(Xbad, 4, seed=42)
    assert got.shape == (4, 8) and np.isfinite(got).all()
    # poisoned rows excluded ⇒ same fit as dropping them up front
    clean = np.delete(X, [3, 17], axis=0)
    assert got.tobytes() == _np_kmeans(clean, 4, seed=42).tobytes()
    with pytest.raises(ValueError, match="no finite embedding rows"):
        _np_kmeans(np.full((5, 8), np.nan), 2, seed=42)
    with pytest.raises(ValueError, match="no finite embedding rows"):
        _np_kmeans(np.empty((0, 8)), 2, seed=42)


def test_capped_expansion_equals_windowed_naive_form(spark):
    """_expand_rep_pairs_capped must equal window(_expand_rep_pairs)
    on a synthetic clone corpus that exercises every branch the doc
    fixture (no exact dupes) cannot: groups LARGER than K (within
    slice binds), groups with no adjacency (solo bypass), multi-group
    adjacency, sim ties resolved by doc_b — in both orderings — and
    (r15) cross rep pairs whose value TIES the identity value (1.0
    desc / 0.0 asc), which defeats the per-member merge bypass and
    forces whole tie-exposed groups through the merge window."""
    from pyspark.sql import Window, functions as F

    from tweetdb_spark.llm.dedup import (
        _expand_rep_pairs, _expand_rep_pairs_capped,
    )

    # groups: rep 1 (ids 1-8), rep 100 (ids 100-103), rep 200 (ids
    # 200-201), rep 300 (id 300, singleton, tie-valued adjacency),
    # rep 400 (id 400, singleton, NO adjacency)
    mem_rows = (
        [(i, 1) for i in range(1, 9)]
        + [(i, 100) for i in range(100, 104)]
        + [(i, 200) for i in range(200, 202)]
        + [(300, 300)]
        + [(400, 400)]
    )
    mem = spark.createDataFrame(mem_rows, "doc_id long, rep_id long")
    rp = spark.createDataFrame(
        [(1, 100, 0.9), (1, 200, 0.9), (100, 200, 0.8),
         # tie-valued cross pairs: 1.0 ties within_value under the
         # descending convention, 0.0 under the ascending one
         (100, 300, 1.0), (200, 300, 0.0)],
        "rep_a long, rep_b long, v double",
    )
    for k in (1, 3, 100):
        for desc in (True, False):
            naive = _expand_rep_pairs(rp, mem, "v", 1.0 if desc else 0.0)
            order = F.col("v").desc() if desc else F.col("v").asc()
            w = Window.partitionBy("doc_a").orderBy(order, "doc_b")
            want = sorted(
                (r.doc_a, r.doc_b, r.v)
                for r in naive.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= k).drop("rn").collect()
            )
            got = sorted(
                (r.doc_a, r.doc_b, r.v)
                for r in _expand_rep_pairs_capped(
                    rp, mem, "v", 1.0 if desc else 0.0, k, descending=desc
                ).collect()
            )
            assert got == want, (k, desc)


def test_approx_distinct_error_bound(q, spark, tables):
    """HLL++ estimates must sit within the configured rsd of the exact
    distinct counts (agg_approx_distinct is rows-only by design; this
    bounds its error against the hash-checked exact twin)."""
    from pyspark.sql import functions as F

    exact = {
        r.event_type: r.n
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    approx = {r[0]: r[1] for r in q("agg_approx_distinct").collect()}
    assert set(approx) == set(exact)
    for k, est in approx.items():
        assert abs(est - exact[k]) / exact[k] < 0.1


def test_pagerank_invariants(q):
    """Rank mass is conserved (no dangling nodes in the symmetric
    graph) and every node keeps at least the teleport floor."""
    rows = q("graph_pagerank").collect()
    assert rows, "fixture dup graph must be non-empty"
    n = len(rows)
    total = sum(r.pagerank for r in rows)
    assert abs(total - 1.0) < n * 1e-6 + 1e-6
    assert all(r.pagerank >= 0.15 / n - 1e-9 for r in rows)


def test_ann_lsh_recall_vs_exact(q):
    """Random-hyperplane LSH (8 bands x 4 bits) recall on this fixture
    is bounded by the banding math, not the implementation: the exact
    top-10 cosines are only ~0.27-0.33 (near-orthogonal synthetic
    vectors), where P(bit match) = 1 - theta/pi = 0.60, so expected
    recall = 1-(1-0.60^4)^8 = 0.66.  Assert above the 3-sigma floor of
    that binomial; sim_ann_ivf's recall=1.0 test shows why the
    data-adaptive quantizer is the right tier for weak-neighbor
    corpora."""
    exact = [r.vec_id for r in q("sim_topk_cosine").collect()]
    approx = [r.vec_id for r in q("sim_ann_lsh").collect()]
    recall = len(set(exact) & set(approx)) / len(exact)
    assert recall >= 0.3


def test_ann_multiprobe_recall_dominates_single_probe(q):
    """Multi-probe must recover at least the single-probe candidate
    recall (it probes a strict superset of buckets), and both must
    overlap the exact top-10."""
    exact = [r.vec_id for r in q("sim_topk_cosine").collect()]
    single = {r.vec_id for r in q("sim_ann_lsh").collect()}
    multi = {r.vec_id for r in q("sim_ann_multiprobe").collect()}
    r_single = len(set(exact) & single) / len(exact)
    r_multi = len(set(exact) & multi) / len(exact)
    assert r_multi >= r_single, (r_multi, r_single)
    assert r_multi >= 0.5, f"multi-probe recall@10 = {r_multi}"


def test_hll_union_lossless_and_bounded(q, spark, tables):
    """The mergeable-sketch contract: (1) estimates sit within the lgK=14
    error bound of exact countDistinct; (2) union-of-daily-sketches is
    LOSSLESS — HLL union is register-wise max, so rolling up persisted
    daily states gives the bit-identical estimate to sketching the raw
    union (the property that makes 'sketch once, roll up forever' safe
    at 100 TB)."""
    from pyspark.sql import functions as F

    exact = {
        r.event_type: r.n
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    union_est = {r.event_type: r.est_users for r in q("agg_hll_union").collect()}
    direct = {
        r.event_type: r.e
        for r in tables["events"]
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 14)).alias("e"))
        .collect()
    }
    assert set(union_est) == set(exact)
    for k, n in exact.items():
        assert abs(union_est[k] - n) / n < 0.05
        assert union_est[k] == direct[k], (
            f"{k}: union-of-daily {union_est[k]} != direct {direct[k]}"
        )


def test_hll_sketch_parquet_roundtrip(q, spark, tables):
    """Daily sketch states survive a parquet persist (binary column) and
    union to the same estimates — the actual production loop: day job
    writes sketches, rollup reads ONLY sketches, never raw events."""
    from pyspark.sql import functions as F

    from tweetdb_spark import scratch

    daily = (
        tables["events"]
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", 14).alias("sk"))
    )
    path = scratch.fresh_dir("tweetdb_hll_rt")
    daily.write.mode("overwrite").parquet(path)
    rolled = {
        r.event_type: r.e
        for r in spark.read.parquet(path)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk", False)).alias("e"))
        .collect()
    }
    expected = {r.event_type: r.est_users for r in q("agg_hll_union").collect()}
    assert rolled == expected


def test_ann_ivf_pq_recall_vs_exact(q):
    """PQ-ADC candidate ranking + exact top-50 re-rank must recover
    most of the brute-force top-10 (same probe set as sim_ann_ivf, so
    any recall drop vs it isolates PQ quantization error)."""
    exact = [r.vec_id for r in q("sim_topk_cosine").collect()]
    pq = {r.vec_id for r in q("sim_ann_ivf_pq").collect()}
    ivf = {r.vec_id for r in q("sim_ann_ivf").collect()}
    recall = len(set(exact) & pq) / len(exact)
    assert recall >= 0.5, f"recall@10 = {recall} (exact={exact}, pq={pq})"
    # re-ranking 50 ADC candidates must not lose what plain IVF finds
    assert len(set(exact) & pq) >= len(set(exact) & ivf) - 2


def test_ann_ivf_pq_train_amortized_out_of_query_path(q, monkeypatch):
    """Warm PQ queries must neither retrain codebooks nor refit KMeans
    — both layouts are built once per (session, corpus)."""
    import pyspark.ml.clustering as C

    from tweetdb_spark.llm import similarity as S

    q("sim_ann_ivf_pq").collect()  # cold call: builds + caches both indexes

    def _no_train(*a, **kw):  # pragma: no cover - failure path
        raise AssertionError("_train_pq invoked on the warm query path")

    def _no_fit(self, *a, **kw):  # pragma: no cover - failure path
        raise AssertionError("KMeans.fit invoked on the warm query path")

    monkeypatch.setattr(S, "_train_pq", _no_train)
    monkeypatch.setattr(C.KMeans, "fit", _no_fit)
    assert len(q("sim_ann_ivf_pq").collect()) == 10


def test_incremental_minhash_consistent_with_banded(q):
    """The incremental flags must be a pure re-labeling of the banded
    pair set under the arrival split: a batch doc is dup_of_corpus iff
    it pairs with a corpus doc, dup_in_batch iff with an EARLIER batch
    doc (band collision is symmetric, so the two operators see the
    same pairs)."""
    pairs = {(r.doc_a, r.doc_b) for r in q("dedup_minhash_banded").collect()}
    inc = list(q("dedup_incremental_minhash").collect())
    assert inc, "en batch must be non-empty"
    for r in inc:
        partners = {a for (a, b) in pairs if b == r.doc_id} | {
            b for (a, b) in pairs if a == r.doc_id
        }
        corp = any(p % 10 != 0 for p in partners)
        early = any(p % 10 == 0 and p < r.doc_id for p in partners)
        assert r.dup_of_corpus == int(corp), (r, sorted(partners))
        assert r.dup_in_batch == int(early), (r, sorted(partners))
        assert r.keep == int(not corp and not early)


def test_ann_ivf_pq_batch_recall_vs_exact_batch(q):
    """Per-query top-3 through the quantized index must recover most
    of the exact batch result."""
    exact = {}
    for r in q("sim_topk_cosine_batch").collect():
        exact.setdefault(r.q_id, set()).add(r.vec_id)
    pq = {}
    for r in q("sim_ann_ivf_pq_batch").collect():
        pq.setdefault(r.q_id, set()).add(r.vec_id)
    assert set(pq) == set(exact)
    hits = sum(len(exact[k] & pq[k]) for k in exact)
    total = sum(len(exact[k]) for k in exact)
    assert hits / total >= 0.5, (hits, total, exact, pq)


def test_containment_dominates_jaccard_and_is_complete(q, registry, spark):
    """Containment >= Jaccard for every pair (min <= union), and the
    prefix-filter candidates reproduce every all-pairs ngram-Jaccard
    hit at tau=0.7 (J >= 0.7 implies containment >= 0.7 >= 0.6, so
    the containment output must contain every Jaccard pair)."""
    from tests.conftest import SF_DIR

    cont = {
        (r.doc_a, r.doc_b): r.containment
        for r in registry.QUERIES["dedup_containment"](spark, SF_DIR).collect()
    }
    jac = {
        (r.doc_a, r.doc_b): r.ngram_jaccard
        for r in registry.QUERIES["dedup_ngram_jaccard"](spark, SF_DIR).collect()
    }
    assert set(jac) <= set(cont)
    for pair, j in jac.items():
        assert cont[pair] >= j - 1e-9


def test_maxsim_bounded_by_four_token_dots(q):
    """MaxSim of 4 sub-vectors is at most 4x the max pairwise dot and
    ranks are dense 1..5 per query."""
    rows = q("sim_maxsim_multivector").collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.q_id, []).append(r.rank)
    assert set(by_q) == {0, 1, 2}
    for ranks in by_q.values():
        assert sorted(ranks) == [1, 2, 3, 4, 5]


def test_bpe_train_matches_pure_python_reference(q, tables):
    """The distributed BPE learner must reproduce the classic
    single-machine algorithm EXACTLY: same merge rules, same order,
    same pair counts (greedy left-to-right, ties (count desc, pair
    asc))."""
    from collections import Counter

    freqs = Counter()
    for r in tables["documents"].where("lang = 'en'").select("text").collect():
        # engine: explode(split(NULL)) emits nothing — mirror it
        for w in (r.text or "").split(" "):
            if w:
                freqs[w] += 1
    words = {w: list(w) for w in freqs}

    def ref_rules(n):
        out = []
        for step in range(n):
            pc = Counter()
            for w, syms in words.items():
                f = freqs[w]
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += f
            if not pc:
                break
            (l, r), cnt = min(
                pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
            )
            out.append((step, l, r, l + r, cnt))
            for w, syms in words.items():
                new, i = [], 0
                while i < len(syms):
                    if (
                        new
                        and new[-1] == l
                        and syms[i] == r
                    ):
                        new[-1] = l + r
                    else:
                        new.append(syms[i])
                    i += 1
                words[w] = new
        return out

    expected = ref_rules(12)
    got = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in q("text_bpe_train").collect()
    ]
    assert got == expected


def test_bpe_train_dict_equals_distributed_trainer(q):
    """The two-level trainer (one distributed word-freq dict, merge
    loop driver-local) must learn rule-for-rule the SAME vocabulary as
    the per-merge-distributed trainer — the rewrite changes execution
    shape (zero Spark round-trips per merge, the 30k-merge posture),
    not the result."""
    a = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in q("text_bpe_train").collect()
    ]
    b = [
        (r.step, r.left, r.right, r.merged, r.pair_count)
        for r in q("text_bpe_train_dict").collect()
    ]
    assert a == b


def test_corpus_shuffle_is_permutation(q):
    """(shard, pos) must be a bijection onto docs: every shard's
    positions are exactly 1..count(shard), and each doc appears once."""
    rows = q("corpus_shuffle").collect()
    assert len({r.doc_id for r in rows}) == len(rows)
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(1, len(ps) + 1)), f"shard {shard} has gaps"


def test_sample_weighted_bias_toward_heavy_docs(q, spark, tables):
    """E-S sampling with weight=n_chars must overselect long docs: the
    sampled mean n_chars exceeds the corpus mean (in expectation by
    construction; deterministic here because the draw is seeded)."""
    sampled = q("sample_weighted").collect()
    docs = {r.doc_id: r.n_chars for r in tables["documents"].select("doc_id", "n_chars").collect()}
    k = len(sampled)
    assert 0 < k <= 1000
    mean_sampled = sum(docs[r.doc_id] for r in sampled) / k
    mean_corpus = sum(docs.values()) / len(docs)
    if k < len(docs):  # a full take is trivially unbiased
        assert mean_sampled > mean_corpus, (mean_sampled, mean_corpus)


def test_ppl_bucket_terciles_and_ordering(q):
    """Buckets within a lang must be contiguous in score: max(head) <=
    min(middle) <= ... and sizes differ by at most 1 (NTILE contract)."""
    rows = q("corpus_ppl_bucket").collect()
    langs = {}
    for r in rows:
        langs.setdefault(r.lang, {}).setdefault(r.bucket, []).append(r.avg_neg_logprob)
    for lang, buckets in langs.items():
        assert set(buckets) <= {"head", "middle", "tail"}
        sizes = [len(v) for v in buckets.values()]
        assert max(sizes) - min(sizes) <= 1, (lang, sizes)
        if {"head", "middle"} <= set(buckets):
            assert max(buckets["head"]) <= min(buckets["middle"]) + 1e-9
        if {"middle", "tail"} <= set(buckets):
            assert max(buckets["middle"]) <= min(buckets["tail"]) + 1e-9


def test_sample_weighted_threshold_agrees_with_single_pass(q):
    """The two-pass threshold plan must return the exact same sample
    set as the single-pass TakeOrdered form (shared oracle contract)."""
    a = {(r.doc_id, r.weight) for r in q("sample_weighted").collect()}
    b = {(r.doc_id, r.weight) for r in q("sample_weighted_threshold").collect()}
    assert a == b


def test_dedup_e2e_verdict_invariants(q):
    """Every doc gets exactly one verdict row; each component keeps
    exactly one doc (the longest, doc_id tiebreak) and everyone else
    points at it; membership counts agree with dedup_cluster_resolve."""
    rows = q("corpus_dedup_e2e").collect()
    by_comp = {}
    for r in rows:
        by_comp.setdefault(r.component_id, []).append(r)
    for comp, rs in by_comp.items():
        kept = [r for r in rs if r.keep]
        assert len(kept) == 1, (comp, rs)
        assert kept[0].reason == "kept"
        assert all(r.keep_doc_id == kept[0].doc_id for r in rs)
        assert all(r.reason in ("exact_dup", "near_dup") for r in rs if not r.keep)
    cr = {r.component_id: r.n_docs for r in q("dedup_cluster_resolve").collect()}
    assert {c: len(rs) for c, rs in by_comp.items()} == cr


def test_dedup_e2e_reason_codes_on_planted_corpus(spark):
    """Exact copies collapse into one component via hamming-0 edges and
    get reason='exact_dup'; unrelated docs stay 'kept' singletons."""
    from tweetdb_spark.llm.dedup import corpus_dedup_e2e

    base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    other = "uno dos tres cuatro cinco seis siete ocho nueve diez once doce"
    docs = spark.createDataFrame(
        [(10, base, len(base)), (11, base, len(base)), (12, other, len(other))],
        "doc_id long, text string, n_chars long",
    )
    out = {r.doc_id: r for r in corpus_dedup_e2e(spark, {"documents": docs}).collect()}
    assert out[10].keep and out[10].reason == "kept"
    assert not out[11].keep and out[11].reason == "exact_dup"
    assert out[11].keep_doc_id == 10 and out[11].component_id == 10
    assert out[12].keep and out[12].component_id == 12


def test_dup_ngram_fraction_flags_planted_boilerplate(spark):
    """Docs sharing a boilerplate prefix must show exactly the 5-grams
    fully inside the shared span as duplicated; docs under 5 tokens
    emit no row (both engines agree on that rule)."""
    from tweetdb_spark.llm.text import text_dup_ngram_fraction

    boiler = "this licensed content is provided as is ok"  # 8 tokens -> 4 5-grams
    docs = spark.createDataFrame(
        [
            (1, boiler + " unique one two three four five"),
            (2, boiler + " different tail six seven eight nine"),
            (3, "totally unrelated words with no shared five gram span"),
            (4, "too short text"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in text_dup_ngram_fraction(spark, {"documents": docs}).collect()
    }
    assert set(out) == {1, 2, 3}  # doc 4 has < 5 tokens
    assert out[1].n_grams == 10 and out[1].n_dup_grams == 4
    assert out[2].n_dup_grams == 4
    assert out[3].n_dup_grams == 0 and out[3].dup_frac == 0.0
    assert abs(out[1].dup_frac - 0.4) < 1e-9


def test_pipeline_audit_consistent_with_stage_ops(q):
    """selected must be exactly the conjunction of its stage columns,
    shard in 0..7 iff selected (else -1), and the stage columns must
    agree with the standalone operators they compose."""
    audit = {r.doc_id: r for r in q("corpus_pipeline_audit").collect()}
    for r in audit.values():
        assert r.selected == (
            r.is_train and r.quality_pass == 1 and r.dedup_keep and r.decontam_clean
        )
        assert (0 <= r.shard <= 7) if r.selected else r.shard == -1
        assert r.is_train == (r.doc_id % 7 != 0)
    dedup = {r.doc_id: r.keep for r in q("corpus_dedup_e2e").collect()}
    assert all(audit[d].dedup_keep == k for d, k in dedup.items())
    quality = {r.doc_id: r.quality_pass for r in q("text_quality").collect()}
    assert all(audit[d].quality_pass == qp for d, qp in quality.items())
    contaminated = {r.doc_id for r in q("text_decontaminate").collect()}
    for d, r in audit.items():
        if r.is_train:
            assert r.decontam_clean == (d not in contaminated)
    assert any(r.selected for r in audit.values())
    assert any(not r.selected for r in audit.values())


def test_stratified_sample_rates_and_determinism(q, tables):
    """Observed per-stratum rates must track the 50/25/10% targets
    (hash buckets are uniform-ish, fixture strata are small, so wide
    tolerance), and membership must be identical across runs."""
    rows = q("corpus_sample_stratified").collect()
    again = q("corpus_sample_stratified").collect()
    assert {r.doc_id for r in rows} == {r.doc_id for r in again}
    totals = {}
    for r in tables["documents"].select("doc_id", "lang").collect():
        totals[r.lang] = totals.get(r.lang, 0) + 1
    kept = {}
    for r in rows:
        kept[r.lang] = kept.get(r.lang, 0) + 1
        assert r.bucket < {"en": 5000, "de": 2500}.get(r.lang, 1000)
    for lang, target in (("en", 0.5), ("de", 0.25)):
        if totals.get(lang, 0) >= 50:
            rate = kept.get(lang, 0) / totals[lang]
            assert abs(rate - target) < 0.15, (lang, rate)


def test_ngram_topk_names_planted_boilerplate(spark):
    """On a corpus where 3 of 4 docs share a boilerplate sentence, the
    shared 5-grams must head the ranking with doc_freq 3."""
    from tweetdb_spark.llm.text import text_ngram_topk

    boiler = "all rights reserved by the original content author here"
    docs = spark.createDataFrame(
        [
            (1, boiler + " apple banana cherry"),
            (2, boiler + " dog elephant fox"),
            (3, boiler + " green house igloo"),
            (4, "completely different words in this document body text"),
        ],
        "doc_id long, text string",
    )
    rows = text_ngram_topk(spark, {"documents": docs}).collect()
    freqs = [r.doc_freq for r in rows]
    assert freqs == sorted(freqs, reverse=True)
    top = [r.gram for r in rows if r.doc_freq == 3]
    assert "all rights reserved by the" in top
    assert len(top) == 5  # 9-token boilerplate -> 5 shared 5-grams


def test_jl_projection_preserves_distances(q, tables):
    """The 64->16 sign projection must bound distortion like a random
    JL matrix: distance ratios centered on 1 with small spread.  (On
    this fixture pairwise distances are nearly uniform — CV ~6% — so
    CORRELATION is the wrong metric: even a true Gaussian projection
    scores ~0.4.  The broken period-8 sign matrix this test caught
    shows ratio std 0.38 and only 82% of pairs within +/-0.5; the
    proper matrix shows 0.16 / 99.6%.)"""
    import numpy as np

    orig = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in tables["embeddings"].select("vec_id", "embedding").limit(40).collect()
    }
    proj = {}
    for r in q("embed_project_jl").collect():
        if r.vec_id in orig:
            proj.setdefault(r.vec_id, [0.0] * 16)[r.k] = r.proj
    ids = sorted(orig)
    ratios = []
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            d0 = np.linalg.norm(orig[ids[a]] - orig[ids[b]])
            d1 = np.linalg.norm(np.array(proj[ids[a]]) - np.array(proj[ids[b]]))
            ratios.append(d1 / d0)
    r = np.array(ratios)
    assert 0.8 < r.mean() < 1.2, r.mean()
    assert r.std() < 0.25, r.std()
    assert np.mean(np.abs(r - 1) < 0.5) >= 0.95, np.mean(np.abs(r - 1) < 0.5)


def test_bpe_encode_matches_pure_python_reference(q, tables):
    """Encoding with the learned vocabulary must yield EXACTLY the
    token counts a single-machine greedy BPE encode produces (the
    same merge-application loop the trainer test verifies, applied
    rule-by-rule in learned order)."""
    rules = [(r.left, r.right) for r in q("text_bpe_train").collect()]

    def encode_len(word):
        syms = list(word)
        for l, r in rules:
            new = []
            for s in syms:
                if new and new[-1] == l and s == r:
                    new[-1] = l + r
                else:
                    new.append(s)
            syms = new
        return len(syms)

    got = {r.doc_id: (r.n_words, r.n_tokens) for r in q("text_bpe_encode").collect()}
    docs = {
        # engine: NULL text explodes to no words, like '' — mirror it
        r.doc_id: [w for w in (r.text or "").split(" ") if w]
        for r in tables["documents"].select("doc_id", "text").collect()
    }
    checked = 0
    for doc_id, words in docs.items():
        if not words:
            assert doc_id not in got
            continue
        want = (len(words), sum(encode_len(w) for w in words))
        assert got[doc_id] == want, (doc_id, got[doc_id], want)
        checked += 1
    assert checked > 100
    # tokens never exceed chars, never undercut words (merges only shrink)
    for r in q("text_bpe_encode").collect():
        assert r.n_words <= r.n_tokens <= r.n_chars_sym


def test_interleave_prefix_proportions_track_weights(q):
    """Any sufficiently long prefix of the interleaved order must
    contain each source roughly in proportion to its weight — the
    stride-scheduling contract; also global_pos must be the sort
    order of (mix_key, source, doc_id) with no gaps."""
    rows = sorted(q("corpus_interleave").collect(), key=lambda r: r.global_pos)
    assert [r.global_pos for r in rows] == list(range(1, len(rows) + 1))
    keys = [(r.mix_key, r.source, r.doc_id) for r in rows]
    assert keys == sorted(keys)
    weights = {r.source: 1 + int(r.source[3:]) % 4 for r in rows}
    total_w = sum(weights.values())
    prefix = rows[: len(rows) // 2]
    counts = {}
    for r in prefix:
        counts[r.source] = counts.get(r.source, 0) + 1
    for src, w in weights.items():
        expected = len(prefix) * w / total_w
        got = counts.get(src, 0)
        # sources are small (25 docs each); allow wide but meaningful
        # tolerance — and exhausted sources can't exceed their size
        assert got <= min(expected * 1.6 + 3, 25), (src, got, expected)
        assert got >= expected * 0.4 - 3, (src, got, expected)


def test_segment_dedup_lossless_rebuild_and_dup_collapse(q, tables):
    """text_segment_dedup's two invariants beyond the oracle hash:
    docs with nothing dropped rebuild to their EXACT original text
    (order-preserving rejoin), and exact-duplicate docs — every
    segment shared — collapse to empty clean_text."""
    from pyspark.sql import functions as F

    res = q("text_segment_dedup")
    joined = res.join(tables["documents"].select("doc_id", "text"), "doc_id")
    clean_rows = joined.where(F.col("n_dropped") == 0).where(
        F.col("clean_text") != F.col("text")
    )
    assert clean_rows.count() == 0

    dup_docs = (
        tables["documents"]
        .groupBy("text")
        .agg(F.count("*").alias("n"), F.collect_list("doc_id").alias("ids"))
        .where(F.col("n") >= 2)
        .select(F.explode("ids").alias("doc_id"))
    )
    if dup_docs.count() > 0:
        bad = res.join(dup_docs, "doc_id").where(F.col("clean_text") != "")
        assert bad.count() == 0


def test_decontaminate_bloom_equals_exact(q):
    """The Bloom prefilter must be semantics-free: byte-identical
    (doc_id, n_shared) to the exact gram equi-join — false negatives
    are impossible by construction, false positives die in the exact
    join."""
    exact = {(r.doc_id, r.n_shared) for r in q("text_decontaminate").collect()}
    bloom = {(r.doc_id, r.n_shared) for r in q("text_decontaminate_bloom").collect()}
    assert bloom == exact


def test_decontaminate_bloom_rejects_clean_grams(spark):
    """A gram absent from the benchmark must be dropped by the filter:
    a corpus whose train docs share nothing with the bench doc yields
    an empty contamination report (i.e. the Bloom tier doesn't pass
    everything through)."""
    from tweetdb_spark.llm.text import text_decontaminate_bloom

    bench = " ".join(f"b{i}" for i in range(12))        # doc_id 0 -> bench
    clean = " ".join(f"c{i}" for i in range(12))        # doc_id 1 -> train
    docs = spark.createDataFrame(
        [(0, bench, len(bench)), (1, clean, len(clean))],
        "doc_id long, text string, n_chars long",
    )
    out = text_decontaminate_bloom(spark, {"documents": docs}).collect()
    assert out == []


def test_quality_classifier_margin_is_sum_of_bucket_weights(spark):
    """Hand-check the linear model on a 2-token doc: margin must be
    w(h(tok1)) + w(h(tok2)) with the documented portable hash, and an
    empty doc must keep a 0-margin fail verdict."""
    from tweetdb_spark.llm.text import text_quality_classifier, _QC_D

    P = 2147483647

    def whash(s):
        return sum(
            ord(c) * ((i * 2654435761) % P) for i, c in enumerate(s, start=1)
        ) % P

    def weight(b):
        return ((b * 2654435761) % P) % 2001 - 1000

    docs = spark.createDataFrame(
        [(0, "alpha bravo", 11), (1, "", 0)],
        "doc_id long, text string, n_chars long",
    )
    out = {r.doc_id: r for r in text_quality_classifier(spark, {"documents": docs}).collect()}
    want = weight(whash("alpha") % _QC_D) + weight(whash("bravo") % _QC_D)
    assert out[0].n_tokens == 2 and out[0].margin == want
    assert out[0].quality_pass == (want > 0)
    assert out[1].n_tokens == 0 and out[1].margin == 0 and not out[1].quality_pass


def test_url_filter_blocks_exactly_the_blocklist_hosts(q):
    """Every doc from a blocklisted source is flagged, every other doc
    isn't, and canonical URLs carry no query string."""
    from tweetdb_spark.llm.text import URL_BLOCKLIST

    rows = q("corpus_url_filter").collect()
    assert rows
    for r in rows:
        assert r.blocked == (r.host in URL_BLOCKLIST)
        assert "?" not in r.canonical_url
        assert r.canonical_url == f"https://{r.host}{r.path}"


def test_pca_power_matches_numpy_iteration_and_reaches_top_band(q, tables):
    """The distributed power iteration must agree with numpy running
    the identical recurrence (same start, same 5 steps) to FP-sum
    tolerance — the distributed-matvec correctness claim — and its
    Rayleigh quotient must land in the top of the spectrum (the
    fixture is near-isotropic, λ1/λ2 ≈ 1.07, so 5 steps cannot fully
    converge; progress toward λ_max is the meaningful invariant)."""
    import numpy as np

    # engine: NULL/empty embeddings contribute nothing to the matvec
    # (posexplode of NULL/array() emits no rows) — the numpy reference
    # stacks exactly the contributing rows
    X = np.array(
        [
            r.embedding
            for r in tables["embeddings"].select("embedding").collect()
            if r.embedding
        ]
    )
    v = np.full(64, 1.0 / 8.0)
    for _ in range(5):
        y = X.T @ (X @ v)
        v = y / np.linalg.norm(y)
    for x in v:
        if abs(x) > 1e-9:
            v = v * (1.0 if x > 0 else -1.0)
            break
    got = np.zeros(64)
    for r in q("embed_pca_power").collect():
        got[r.pos] = r.loading
    assert np.max(np.abs(got - v)) < 1e-4, np.max(np.abs(got - v))
    lam_max = np.linalg.eigvalsh(X.T @ X)[-1]
    rayleigh = float(got @ (X.T @ (X @ got))) / float(got @ got)
    assert rayleigh > 0.8 * lam_max, (rayleigh, lam_max)


def test_degree_distribution_consistent_with_pair_graph(q):
    """Σ(degree × n_nodes) must equal 2×|edges| of the simhash pair
    graph — the handshake lemma ties the histogram back to the edge
    list the other graph ops consume."""
    rows = q("graph_degree_distribution").collect()
    total_deg = sum(r.degree * r.n_nodes for r in rows)
    n_edges = q("dedup_simhash").count()
    assert total_deg == 2 * n_edges


def test_shard_manifest_is_tar_consistent(q):
    """Offsets must tile the shard byte-space exactly: sorting by
    (shard, offset) gives contiguous non-overlapping blobs whose
    global offsets are the running sum of lengths."""
    rows = sorted(
        q("multimodal_shard_manifest").collect(),
        key=lambda r: (r.shard_id, r.shard_offset),
    )
    cum = 0
    for r in rows:
        assert r.shard_id * 65536 + r.shard_offset == cum, r
        cum += r.n_bytes
    assert cum == sum(r.n_bytes for r in rows)


def test_hybrid_rrf_fuses_both_legs(q):
    """Top-10 must carry contributions from both retrievers: every row
    has at least one rank, the fused score is exactly the RRF formula
    of its ranks, and the list is rrf-descending."""
    rows = q("sim_hybrid_rrf").collect()
    assert len(rows) == 10
    prev = None
    for r in rows:
        want = 0.0
        if r.text_rank is not None:
            want += 1.0 / (60 + r.text_rank)
        if r.vec_rank is not None:
            want += 1.0 / (60 + r.vec_rank)
        assert abs(r.rrf_score - want) < 1e-8
        assert prev is None or r.rrf_score <= prev
        prev = r.rrf_score
    assert any(r.text_rank is not None for r in rows)
    assert any(r.vec_rank is not None for r in rows)


def test_entropy_separates_planted_extremes(spark):
    """A constant-char doc must score ~0 bits/char (low_entropy), a
    64-distinct-char doc exactly 6 bits/char."""
    from tweetdb_spark.llm.text import text_entropy

    flat = "a" * 100
    rich = "".join(chr(33 + i) for i in range(64))
    docs = spark.createDataFrame(
        [(0, flat, 100), (1, rich, 64), (2, "", 0)],
        "doc_id long, text string, n_chars long",
    )
    out = {r.doc_id: r for r in text_entropy(spark, {"documents": docs}).collect()}
    assert out[0].bits_per_char == 0.0 and out[0].low_entropy
    assert out[1].bits_per_char == 6.0 and not out[1].low_entropy
    assert out[2].bits_per_char == 0.0 and out[2].low_entropy


def test_banded_candidates_exactly_once_vs_multiband_distinct(spark):
    """The r11 dedup-free banding (first-collision ownership) must emit
    each colliding pair EXACTLY once and match the distinct() of the
    naive emit-per-band form — on a corpus built to collide in multiple
    bands (identical docs collide in ALL 8; near-identical in several)."""
    from pyspark.sql import functions as F

    from tweetdb_spark.llm.dedup import _banded_candidate_pairs, _mh_band_sql

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (1, base),
        (2, base),                          # identical → all 8 bands collide
        (3, base + " extra"),               # near-identical → several bands
        (4, base.replace("alpha", "omega")),
        (5, "totally different words here nothing shared at all xyzzy"),
        (6, base),                          # 3-clique of identicals
    ]
    g = (
        spark.createDataFrame(docs, "doc_id long, text string")
        .select(
            "doc_id",
            F.expr(
                "transform(array_distinct(split(text, ' ')),"
                " w -> xxhash64(w) & 2147483647)"
            ).alias("g"),
        )
    )
    got = [(r.doc_a, r.doc_b) for r in _banded_candidate_pairs(g, n_bands=8).collect()]
    assert len(got) == len(set(got)), "a pair was emitted by more than one band"

    # reference: naive per-band emission + distinct
    bands = _mh_band_sql("spark", 8)
    banded = g.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(j).alias("j"), F.expr(b).alias("v"))
                    for j, b in enumerate(bands)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.j", "band.v")
    a, b = banded.alias("a"), banded.alias("b")
    ref = {
        (r.doc_a, r.doc_b)
        for r in a.join(
            b,
            (F.col("a.j") == F.col("b.j"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .collect()
    }
    assert set(got) == ref
    # the identical trio must be fully connected candidates
    assert {(1, 2), (1, 6), (2, 6)} <= ref


@pytest.mark.skipif(
    bool(__import__("tests.conftest", fromlist=["EDGE_MODE"]).EDGE_MODE),
    reason="builds its OWN degenerate fixture; the EDGE_MODE-patched "
    "catalog loader shadows the custom dir, so the probe targets "
    "(vec_id 0/2/7/8) no longer carry the degenerates being tested",
)
def test_ann_family_degenerate_vectors(spark, registry, tmp_path_factory):
    """r12 rows-only edge survey (verdict ask #5 + ADVICE _qprep): NULL
    and empty embeddings must neither crash the index builds (corpus
    side: KMeans/PQ/LSH ingest) nor the driver-side query preps, in any
    ANN tier.  vec_id 0 goes NULL (the single-query forms' query) and
    vec_id 2 empty (a batch query); vec_id 7/8 are corpus-side
    degenerates that must silently drop out of every index."""
    import os

    from pyspark.sql import functions as F

    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("ann_edge"))
    for name in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        os.symlink(f"{src}/{name}.parquet", f"{d}/{name}.parquet")
    e = spark.read.parquet(f"{src}/embeddings.parquet")
    dt = e.schema["embedding"].dataType
    e.withColumn(
        "embedding",
        F.when(F.col("vec_id").isin(0, 7), F.lit(None).cast(dt))
        .when(F.col("vec_id").isin(2, 8), F.array().cast(dt))
        .otherwise(F.col("embedding")),
    ).coalesce(1).write.parquet(f"{d}/embeddings.parquet")

    # single-query tiers: the query vector itself is degenerate ->
    # empty result with the production schema, never a crash
    for key in ("sim_ann_ivf", "sim_ann_ivf_pq", "sim_ann_lsh", "sim_ann_multiprobe"):
        out = registry.QUERIES[key](spark, d)
        assert out.count() == 0, key
        assert "cos_sim" in out.columns, key

    # batch tier: degenerate queries drop, valid ones still get top-3,
    # and no degenerate corpus vector ever surfaces as a neighbor
    rows = registry.QUERIES["sim_ann_ivf_pq_batch"](spark, d).collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.q_id, []).append(r.vec_id)
    assert set(per_q) == {1, 3, 4}, per_q
    assert all(len(v) == 3 for v in per_q.values()), per_q
    assert not any(v in (7, 8) for vs in per_q.values() for v in vs), per_q


def test_corpus_interleave_two_pass_equals_single_sort(
    registry, spark, monkeypatch
):
    """r16 optimization round: the bucketed two-pass row_number form
    (engaged above the _INTERLEAVE_TWO_PASS_MIN_BYTES stats gate) must
    be row-identical to the direct single-sort form on the same
    corpus — base-offset + within-bucket rank IS the global rank."""
    key = "corpus_interleave"
    monkeypatch.setenv(
        "TWEETDB_INTERLEAVE_TWO_PASS_MIN_BYTES", str(1 << 60)
    )  # force single-sort
    single = sorted(map(tuple, registry.QUERIES[key](spark, SF_DIR).collect()))
    monkeypatch.setenv(
        "TWEETDB_INTERLEAVE_TWO_PASS_MIN_BYTES", "0"
    )  # force two-pass
    two = sorted(map(tuple, registry.QUERIES[key](spark, SF_DIR).collect()))
    assert single == two


def test_corpus_pack_two_pass_equals_direct(registry, spark, monkeypatch):
    """r17 optimization round: the bucketed two-pass running sum
    (min/max-derived monotone doc_id buckets, base offset +
    within-bucket exclusive sum) must be row-identical to the direct
    per-lang window — concatenating buckets in bh order IS the global
    per-lang doc_id order.  Counter multiset (NULL-safe, no sorted())."""
    from collections import Counter

    key = "corpus_pack"
    monkeypatch.setenv("TWEETDB_PACK_TWO_PASS_MIN_BYTES", str(1 << 60))
    direct = Counter(map(tuple, registry.QUERIES[key](spark, SF_DIR).collect()))
    monkeypatch.setenv("TWEETDB_PACK_TWO_PASS_MIN_BYTES", "0")
    two = Counter(map(tuple, registry.QUERIES[key](spark, SF_DIR).collect()))
    assert direct == two


def test_corpus_token_budget_two_pass_equals_direct(
    registry, spark, monkeypatch
):
    """r16 optimization round: the bucket-pruned two-pass running sum
    must be row-identical to the direct per-lang window — bucket base +
    within-bucket sum IS the running total, and a pruned bucket (base
    >= budget) can contain no surviving row since n_tokens >= 0."""
    key = "corpus_token_budget"
    monkeypatch.setenv(
        "TWEETDB_TOKEN_BUDGET_TWO_PASS_MIN_BYTES", str(1 << 60)
    )
    direct = sorted(map(tuple, registry.QUERIES[key](spark, SF_DIR).collect()))
    monkeypatch.setenv("TWEETDB_TOKEN_BUDGET_TWO_PASS_MIN_BYTES", "0")
    two = sorted(map(tuple, registry.QUERIES[key](spark, SF_DIR).collect()))
    assert direct == two
