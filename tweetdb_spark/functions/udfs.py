"""UDF / UDAF / UDTF surface (SURVEY.md §2.9, U1–U4).

The deliberate demonstration of Spark's Python extension points, in
increasing sophistication:
  U1 row-at-a-time UDF   — the slow path (pickled per row); kept tiny
                           and only here to cover the API surface.
  U2 pandas scalar UDF   — Arrow-batched, vectorized (the right way).
  U3 applyInPandas       — grouped-map UDAF over embedding vectors.
  U4 Python UDTF         — table function (Spark 4), lateral explode.

Everything else in the engine uses JVM builtins; UDFs are never in a
hot path unless Arrow-vectorized.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, StringType

from tweetdb_spark.registry import query

_LANG_NAMES = {
    "en": "english",
    "de": "german",
    "es": "spanish",
    "fr": "french",
    "zh": "chinese",
}


@query(
    "udf_python",
    oracle="""
    SELECT doc_id,
           CASE lang WHEN 'en' THEN 'english'
                     WHEN 'de' THEN 'german'
                     WHEN 'es' THEN 'spanish'
                     WHEN 'fr' THEN 'french'
                     WHEN 'zh' THEN 'chinese'
                     ELSE 'other' END AS lang_name
    FROM documents
    """,
)
def udf_python(spark, t):
    """U1: row-at-a-time scalar UDF (crude lang normalization)."""

    @udf(StringType())
    def lang_name(lang):
        return _LANG_NAMES.get(lang, "other")

    return t["documents"].select("doc_id", lang_name("lang").alias("lang_name"))


@query(
    "udf_python_arrow",
    oracle="""
    SELECT doc_id,
           CASE lang WHEN 'en' THEN 'english'
                     WHEN 'de' THEN 'german'
                     WHEN 'es' THEN 'spanish'
                     WHEN 'fr' THEN 'french'
                     WHEN 'zh' THEN 'chinese'
                     ELSE 'other' END AS lang_name
    FROM documents
    """,
)
def udf_python_arrow(spark, t):
    """U1's Arrow-optimized twin (``useArrow=True``): same row-at-a-
    time Python function, but inputs/outputs cross the JVM↔Python
    boundary as Arrow batches instead of pickled rows — the Spark 4
    migration path for legacy Python UDFs that can't be rewritten
    vectorized.  Identical oracle to udf_python, so the hash check
    proves the serialization change is semantics-free; the remaining
    gap to a true pandas_udf (U2) is the per-row Python call, which
    Arrow doesn't remove."""

    @udf(StringType(), useArrow=True)
    def lang_name(lang):
        return _LANG_NAMES.get(lang, "other")

    return t["documents"].select("doc_id", lang_name("lang").alias("lang_name"))


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS discounted
    FROM lineitem
    """,
)
def udf_pandas_scalar(spark, t):
    """U2: vectorized Arrow UDF (Series→Series), ~10-100× over U1.

    Same arithmetic as P1 — per-row IEEE ops are order-independent, so
    the raw doubles hash-match the SQL oracle.
    """

    @pandas_udf(DoubleType())
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1.0 - disc)

    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        discounted("l_extendedprice", "l_discount").alias("discounted"),
    )


@query(
    "udaf_pandas_agg",
    oracle="""
    WITH norms AS (
      SELECT label,
             -- empty vector -> norm 0 (Spark folds from 0.0); NULL
             -- vector -> NULL norm (r11 empty-value survey)
             CASE WHEN embedding IS NULL THEN NULL
                  ELSE sqrt(COALESCE(list_sum(list_transform(embedding,
                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 0))
             END AS norm
      FROM embeddings
    )
    SELECT label,
           count(*) AS n,
           MAX(norm) AS max_norm,
           ROUND(AVG(norm), 2) AS mean_norm
    FROM norms GROUP BY label
    """,
)
def udaf_pandas_agg(spark, t):
    """U3: grouped-map pandas UDAF — per-label embedding-norm stats.

    ``applyInPandas`` streams each label group as an Arrow batch into
    Python.  Norms are accumulated left-to-right in float64 to mirror
    DuckDB's ``list_sum`` order exactly (max is then bit-identical;
    the mean is rounded).  Partitioning is by label (10 groups, evenly
    sized) — at 100 TB use a salted two-level agg if a group outgrows
    one executor's memory.
    """

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        # SQL NULL semantics by hand: a NULL embedding has a NULL norm
        # — COUNT(*) still counts the row, MAX/AVG skip it, and an
        # all-NULL group yields NULL stats (r11 NULL survey; iterating
        # a None vector crashed the worker)
        norms = []
        for emb in pdf["embedding"]:
            if emb is None:
                continue
            acc = 0.0
            for x in emb:
                xd = float(x)
                acc += xd * xd
            norms.append(acc**0.5)
        if norms:
            mean = sum(norms) / len(norms)
            max_norm = pd.Series(norms).max()
            # half-away-from-zero like DuckDB ROUND — Python's
            # round() is half-to-even and diverges on exact ties
            mean_norm = int(mean * 100 + 0.5) / 100
        else:
            max_norm = None
            mean_norm = None
        return pd.DataFrame(
            {
                "label": [pdf["label"].iloc[0]],
                "n": [len(pdf)],
                "max_norm": [max_norm],
                "mean_norm": [mean_norm],
            }
        )

    return (
        t["embeddings"]
        .groupBy("label")
        .applyInPandas(stats, "label int, n long, max_norm double, mean_norm double")
    )


@udtf(returnType="token: string, pos: int")
class TokenizeUDTF:
    """U4 table function: text → (token, 1-based position) rows."""

    def eval(self, text: str):
        if text is None:
            return
        for i, tok in enumerate(text.split(" ")):
            yield tok, i + 1


@query(
    "udtf_python",
    oracle="""
    SELECT doc_id,
           unnest(string_split(text, ' ')) AS token,
           CAST(unnest(range(1, len(string_split(text, ' ')) + 1)) AS INTEGER) AS pos
    FROM documents
    """,
)
def udtf_python(spark, t):
    """U4: Python UDTF (Spark 4) in a LATERAL join — positional tokenize.

    The DuckDB oracle zips two parallel unnests (DuckDB's equivalent
    of WITH ORDINALITY).
    """
    spark.udtf.register("tokenize_udtf", TokenizeUDTF)
    return spark.sql(
        """
        SELECT d.doc_id, tk.token, tk.pos
        FROM documents d, LATERAL tokenize_udtf(d.text) tk
        """
    )


@query(
    "udf_cogrouped_map",
    oracle="""
    WITH c AS (
      SELECT c_nationkey AS nationkey, count(*) AS n_cust,
             CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS cust_bal_cents
      FROM customer GROUP BY 1
    ), s AS (
      SELECT s_nationkey AS nationkey, count(*) AS n_supp,
             CAST(SUM(CAST(ROUND(s_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS supp_bal_cents
      FROM supplier GROUP BY 1
    )
    SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp,
           COALESCE(c.cust_bal_cents, 0) AS cust_bal_cents,
           COALESCE(s.supp_bal_cents, 0) AS supp_bal_cents
    FROM c FULL OUTER JOIN s
      ON c.nationkey IS NOT DISTINCT FROM s.nationkey
    """,
)
def udf_cogrouped_map(spark, t):
    """Cogrouped-map pandas UDF — the last member of the Python UDF
    family (scalar U1/U2, grouped-agg U3, table U4, Arrow-scalar,
    mapInPandas): ``groupBy(k).cogroup(other.groupBy(k))
    .applyInPandas`` aligns BOTH tables' partitions for one key into a
    single Python call.

    Per nation, the customer and supplier groups arrive as two Arrow
    batches; the fn merges them into one summary row — the custom-
    merge shape (as-of joins, interval reconciliation, per-key model
    scoring against a reference set) when the merge logic genuinely
    needs imperative pandas.  Money is summed as integer cents so the
    Python path is exactly reproducible in SQL; the ORACLE is the
    relational full-outer aggregate join, proving the cogroup
    plumbing (including empty-side groups) value-equivalent.  At
    100 TB both sides shuffle once on the cogroup key — same exchange
    cost as the equivalent join — and each (key, both-sides) group
    must fit one worker's pandas heap, so keys are pre-aggregated
    partials where possible (here: the groups are already nation-
    sized).
    """

    def merge(key, cust: pd.DataFrame, supp: pd.DataFrame) -> pd.DataFrame:
        def cents(s: pd.Series) -> int:
            # dropna: SQL SUM skips NULLs (NaN after Arrow transfer);
            # int(NaN*...) crashed the worker (r11 NULL-survey catch)
            return int(
                sum(int(v * 100 + (0.5 if v >= 0 else -0.5)) for v in s.dropna())
            )

        return pd.DataFrame(
            {
                # a NULL nationkey is ONE cogroup (grouping treats NULL
                # as a key value), and Arrow hands the NULL key to
                # Python as NaN — int(NaN) crashed the worker (r11
                # NULL survey; the oracle's join is null-safe to match)
                "nationkey": [None if pd.isna(key[0]) else int(key[0])],
                "n_cust": [len(cust)],
                "n_supp": [len(supp)],
                "cust_bal_cents": [cents(cust["c_acctbal"]) if len(cust) else 0],
                "supp_bal_cents": [cents(supp["s_acctbal"]) if len(supp) else 0],
            }
        )

    c = t["customer"].select("c_nationkey", "c_acctbal")
    s = t["supplier"].select("s_nationkey", "s_acctbal")
    return (
        c.groupBy("c_nationkey")
        .cogroup(s.groupBy("s_nationkey"))
        .applyInPandas(
            merge,
            "nationkey long, n_cust long, n_supp long, "
            "cust_bal_cents long, supp_bal_cents long",
        )
    )


@query(
    "udf_map_arrow",
    oracle="""
    SELECT o_orderkey,
           CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
           o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%'
             AS is_urgent
    FROM orders WHERE o_totalprice > 150000
    """,
)
def udf_map_arrow(spark, t):
    """``mapInArrow`` — the zero-copy end of the Python UDF spectrum:
    the fn receives raw ``pyarrow.RecordBatch``es and answers with
    RecordBatches, no pandas materialization at all.

    The body uses ``pyarrow.compute`` kernels (vectorized C++, same
    family Spark's own Arrow path uses), so the only Python cost is
    per-BATCH dispatch — the right tier when a library speaks Arrow
    natively (tokenizers, image codecs, ONNX runtimes).  Arithmetic
    is integer cents and boolean flags, so the oracle's relational
    form is exactly reproducible.  The filter stays OUTSIDE the UDF
    as a real Catalyst predicate (pushed to the scan); the UDF only
    maps — mapInArrow is a black box to the optimizer, so anything
    prunable must stay out of it.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def project(batches):
        for b in batches:
            price = b.column("o_totalprice")
            prio = b.column("o_orderpriority")
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("o_orderkey"),
                    pc.cast(pc.round(pc.multiply(price, 100.0)), pa.int64()),
                    pc.or_(
                        pc.starts_with(prio, "1-"), pc.starts_with(prio, "2-")
                    ),
                ],
                names=["o_orderkey", "price_cents", "is_urgent"],
            )

    return (
        t["orders"]
        .where(F.col("o_totalprice") > 150000)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .mapInArrow(
            project, "o_orderkey long, price_cents long, is_urgent boolean"
        )
    )
