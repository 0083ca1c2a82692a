"""Deduplication operators (SURVEY.md §2.10, L1–L3).

The three-tier dedup ladder a training-data pipeline needs:
  L1 exact       — normalized-hash groupBy; the 100 TB default
                   (shuffle carries 32-byte hashes, not documents).
  L2 near, exact — pairwise token-set Jaccard; quadratic ground truth
                   used to validate L3 and for small candidate sets.
  L3 near, approx— MinHash + LSH banding via Spark ML; the scale path
                   (candidate pairs only for bucket collisions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetdb_spark.registry import query


@query(
    "dedup_exact",
    oracle="""
    SELECT sha256(lower(trim(text))) AS text_hash,
           MIN(doc_id) AS keep_doc_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact(spark, t):
    """L1: exact dedup on a normalized content hash.

    Canonical-keeper = min(doc_id) per hash.  groupBy on the hash
    spreads uniformly at any scale (sha2 is its own salt); the
    downstream "keep" set is a semi-join of documents against this.
    """
    return (
        t["documents"]
        .select("doc_id", F.sha2(F.lower(F.trim(F.col("text"))), 256).alias("text_hash"))
        .groupBy("text_hash")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
        )
    )


@query(
    "dedup_near_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_distinct(string_split(text, ' ')) AS tokens
      FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(
             CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE)
             / (len(a.tokens) + len(b.tokens) - len(list_intersect(a.tokens, b.tokens))),
             6) AS jaccard
    FROM toks a JOIN toks b ON a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.tokens, b.tokens)) AS DOUBLE)
          / (len(a.tokens) + len(b.tokens) - len(list_intersect(a.tokens, b.tokens)))
          >= 0.8
    """,
)
def dedup_near_jaccard(spark, t):
    """L2: exact pairwise token-set Jaccard ≥ 0.8.

    Quadratic by construction (ground truth for L3) — |A∪B| computed
    as |A|+|B|−|A∩B| so both engines use identical set primitives.
    The division is a single exact-operand double op: raw values
    match; rounded for output hygiene.
    """
    toks = t["documents"].select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("tokens")
    )
    a = toks.alias("a")
    b = toks.alias("b")
    inter = F.size(F.array_intersect(F.col("a.tokens"), F.col("b.tokens")))
    union = F.size(F.col("a.tokens")) + F.size(F.col("b.tokens")) - inter
    jac = inter.cast("double") / union
    return (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .where(jac >= 0.8)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


@query("dedup_minhash_lsh", oracle=None)  # approx candidates → rows-only
def dedup_minhash_lsh(spark, t):
    """L3: MinHash+LSH near-dup candidates — the 100 TB path for L2.

    Pipeline: tokens → binary term vector (HashingTF: stateless,
    deterministic, no fitted vocabulary to broadcast) → MinHashLSH
    (fixed seed) → approxSimilarityJoin on Jaccard *distance* ≤ 0.2.
    Complexity is bucket-collision-bound instead of quadratic: each of
    the h hash tables buckets by one minhash value, candidates are
    generated per-bucket via an equi-join on (table, hash), then exact
    distance re-filters.  Rows-only check (LSH is approximate); L2 is
    the hash-checked exact twin at small N.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH, Tokenizer

    docs = t["documents"].select("doc_id", "text")
    tokens = Tokenizer(inputCol="text", outputCol="words").transform(docs)
    tf = HashingTF(
        inputCol="words", outputCol="features", numFeatures=1 << 12, binary=True
    ).transform(tokens)
    model = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=5, seed=42
    ).fit(tf)
    pairs = model.approxSimilarityJoin(tf, tf, 0.2, distCol="jaccard_dist")
    return (
        pairs.where(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round("jaccard_dist", 6).alias("jaccard_dist"),
        )
    )
