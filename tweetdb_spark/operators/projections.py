"""Projection / filter / predicate operators (SURVEY.md §2.2, P1–P3).

All three stay entirely inside whole-stage codegen: no shuffle, no
Python, per-row expressions evaluated in the same IEEE order as the
DuckDB oracle (so raw — unrounded — doubles hash-match; only
*aggregated* floats need the rounding discipline).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetdb_spark.registry import query


@query(
    "project_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           CAST(l_quantity AS INTEGER) AS qty_int
    FROM lineitem
    """,
)
def project_arith(spark, t):
    """P1: derived arithmetic columns + cast, aliased."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
        F.col("l_quantity").cast("int").alias("qty_int"),
    )


@query(
    "filter_compound",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 10000 AND 200000
      AND NOT (o_orderpriority LIKE '1%')
      AND o_custkey IS NOT NULL
    """,
)
def filter_compound(spark, t):
    """P2: AND / NOT / IN / BETWEEN / IS NULL predicate combination.

    The stream-filter analog of the reference's track/follow
    predicates.  All conjuncts are pushable to parquet except LIKE
    (evaluated post-scan in codegen).
    """
    o = t["orders"]
    return o.where(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(10000, 200000)
        & ~F.col("o_orderpriority").like("1%")
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "filter_like",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    WHERE text LIKE '%window%' OR regexp_matches(text, 'join[a-z]*  *filter')
    """,
)
def filter_like(spark, t):
    """P3: keyword track-list analog — LIKE and regexp over text."""
    d = t["documents"]
    return d.where(
        F.col("text").like("%window%") | F.col("text").rlike("join[a-z]*  *filter")
    ).select("doc_id", "lang")
