"""Text-analysis operators (SURVEY.md §2.10, L6–L8).

Token-level analytics over `documents` — TF-IDF, lexicon sentiment
(the EDBT'16 Spark-sentiment pattern: token ⋈ static lexicon), and
corpus stats.  Everything is explode → agg → (broadcast) join: the
shuffle unit is the token or the doc key, never the raw text.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tweetdb_spark.registry import query

# Static sentiment lexicon over the fixture vocabulary (an engine
# constant, not a fixture — FIXTURES.md "Synthetic-generation notes").
SENTIMENT_LEXICON: list[tuple[str, int]] = [
    ("fast", 2),
    ("small", 1),
    ("big", 1),
    ("merge", 1),
    ("slow", -2),
    ("error", -2),
    ("skew", -1),
    ("spill", -1),
]

_LEX_VALUES = ", ".join(f"('{w}', {s})" for w, s in SENTIMENT_LEXICON)


@query(
    "text_tf_idf",
    oracle="""
    WITH tok AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, lang, token, count(*) AS tf
      FROM tok GROUP BY doc_id, lang, token
    ), df AS (
      SELECT token, count(*) AS df FROM tf GROUP BY token
    ), n AS (
      SELECT count(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.lang, tf.token,
             ROUND(SUM(tf.tf * LN(CAST(n.n_docs AS DOUBLE) / df.df)), 4) AS tfidf
      FROM tf JOIN df USING (token) CROSS JOIN n
      GROUP BY tf.lang, tf.token
    )
    SELECT lang, token, tfidf, rn
    FROM (
      SELECT lang, token, tfidf,
             row_number() OVER (
               PARTITION BY lang ORDER BY tfidf DESC, token
             ) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def text_tf_idf(spark, t):
    """L6: top-5 TF-IDF terms per language.

    Two aggregations + one broadcast join: tf on (doc,token), df on
    token (vocab-sized — always broadcastable), idf = ln(N/df) with N
    joined in as a 1-row broadcast aggregate (never a driver-side
    collect).  Final per-lang top-k via window rank.
    """
    tok = t["documents"].select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("token")
    )
    tf = tok.groupBy("doc_id", "lang", "token").agg(F.count("*").alias("tf"))
    df = tf.groupBy("token").agg(F.count("*").alias("df"))
    n = t["documents"].agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), "token")
        .crossJoin(F.broadcast(n))
        .groupBy("lang", "token")
        .agg(
            F.round(
                F.sum(
                    F.col("tf")
                    * F.log(F.col("n_docs").cast("double") / F.col("df"))
                ),
                4,
            ).alias("tfidf")
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("token"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("lang", "token", "tfidf", "rn")
    )


@query(
    "text_sentiment_lexicon",
    oracle=f"""
    WITH lex(token, score) AS (VALUES {_LEX_VALUES}),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token
      FROM documents
    )
    SELECT tok.doc_id,
           count(*) AS n_tokens,
           count(lex.score) AS n_hits,
           CAST(COALESCE(SUM(lex.score), 0) AS BIGINT) AS score_sum,
           CAST(COALESCE(SUM(lex.score), 0) AS DOUBLE) / count(*) AS polarity
    FROM tok LEFT JOIN lex USING (token)
    GROUP BY tok.doc_id
    """,
)
def text_sentiment_lexicon(spark, t):
    """L7: lexicon-join polarity per document (EDBT'16 pattern).

    The lexicon is a broadcast static dim (exactly the reference's
    keyword-list shape); integer score sums are exact, and the final
    polarity is a single exact division — no rounding needed.
    """
    lex = F.broadcast(
        spark.createDataFrame(SENTIMENT_LEXICON, "token string, score int")
    )
    tok = t["documents"].select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )
    return (
        tok.join(lex, "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.count("score").alias("n_hits"),
            F.coalesce(F.sum("score"), F.lit(0)).cast("long").alias("score_sum"),
            (
                F.coalesce(F.sum("score"), F.lit(0)).cast("double") / F.count("*")
            ).alias("polarity"),
        )
    )


@query(
    "text_stats",
    oracle="""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           ROUND(AVG(n_chars), 2) AS avg_chars,
           CAST(SUM(CASE WHEN n_chars = length(text) THEN 1 ELSE 0 END) AS BIGINT)
             AS n_len_valid,
           ROUND(AVG(len(string_split(text, ' '))), 2) AS avg_tokens
    FROM documents
    GROUP BY lang, source
    """,
)
def text_stats(spark, t):
    """L8: per-(lang, source) corpus statistics + n_chars validation.

    The quality-scoring primitive: length stats, token counts, and a
    data-integrity column (n_chars == length(text)) in one pass.
    """
    d = t["documents"]
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        F.sum(
            F.when(F.col("n_chars") == F.length("text"), 1).otherwise(0)
        ).alias("n_len_valid"),
        F.round(F.avg(F.size(F.split("text", " "))), 2).alias("avg_tokens"),
    )
