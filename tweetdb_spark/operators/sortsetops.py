"""Sort / limit / top-k / set operators (SURVEY.md §2.6, O1–O5).

Note: the driver's value-hash is order-insensitive, so sorts are
verified by row *content*; the ordering itself is exercised in
tests/test_operators.py where order matters (head() assertions).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetdb_spark.registry import query


@query(
    "sort_multicol",
    oracle="""
    SELECT s_suppkey, s_nationkey, s_acctbal
    FROM supplier
    ORDER BY s_nationkey ASC NULLS FIRST, s_acctbal DESC, s_suppkey
    """,
)
def sort_multicol(spark, t):
    """O1: global multi-column sort, mixed direction, NULLS FIRST.

    Range-partitioned sample-based global sort (Exchange rangepartitioning)
    — Spark samples keys to build balanced ranges, so the sort scales
    without a single-reducer bottleneck.
    """
    return (
        t["supplier"]
        .select("s_suppkey", "s_nationkey", "s_acctbal")
        .orderBy(
            F.col("s_nationkey").asc_nulls_first(),
            F.col("s_acctbal").desc(),
            F.col("s_suppkey"),
        )
    )


@query(
    "topk_global",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def topk_global(spark, t):
    """O2: global top-10 by totalprice.

    Plans as TakeOrderedAndProject: per-partition top-10 → driver
    merge of k×partitions rows — no global sort, no full shuffle.
    Tie-break on o_orderkey makes the result set deterministic.
    """
    return (
        t["orders"]
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


@query(
    "setop_union",
    oracle="""
    SELECT nationkey, name, kind FROM (
      SELECT c_nationkey AS nationkey, c_name AS name, 'cust' AS kind FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey, s_name AS name, 'supp' AS kind FROM supplier
    )
    """,
)
def setop_union(spark, t):
    """O3: UNION ALL of name/key pairs from two tables (schema-aligned)."""
    c = t["customer"].select(
        F.col("c_nationkey").alias("nationkey"),
        F.col("c_name").alias("name"),
        F.lit("cust").alias("kind"),
    )
    s = t["supplier"].select(
        F.col("s_nationkey").alias("nationkey"),
        F.col("s_name").alias("name"),
        F.lit("supp").alias("kind"),
    )
    return c.unionAll(s)


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect(spark, t):
    """O4: nations having both customers and suppliers (INTERSECT = distinct)."""
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "setop_intersect_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_intersect_all(spark, t):
    """INTERSECT ALL — bag intersection (min multiplicity per value).

    ``intersectAll`` plans as a partial-count aggregate on each side
    followed by a hash join on the value — two map-side-combined
    shuffles of distinct values, never a row-by-row comparison, so it
    scales like a groupBy even when the inputs repeat keys heavily.
    """
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s)


@query(
    "setop_except_all",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT ALL
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_except_all(spark, t):
    """EXCEPT ALL — bag difference (left multiplicity minus right).

    Complements O5's EXCEPT DISTINCT: a key with 7 customer rows and 2
    supplier rows survives 5 times here, 0 times under ``subtract``.
    Same scale shape as intersectAll (count-aggregate + join on value).
    """
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.exceptAll(s)


@query(
    "setop_union_byname",
    oracle="""
    SELECT c_custkey AS key, c_name AS name, c_mktsegment AS mktsegment,
           NULL::BIGINT AS nationkey
    FROM customer
    UNION ALL BY NAME
    SELECT s_suppkey AS key, s_name AS name, s_nationkey AS nationkey
    FROM supplier
    """,
)
def setop_union_byname(spark, t):
    """UNION ALL BY NAME with schema evolution (missing columns → NULL).

    ``unionByName(allowMissingColumns=True)`` aligns columns by name,
    not position — the schema-evolution-tolerant append used when two
    parquet generations of the same table have drifted.  Purely a
    metadata operation plus a concat of scans: no shuffle at all.
    """
    c = t["customer"].select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.col("c_mktsegment").alias("mktsegment"),
    )
    s = t["supplier"].select(
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
        F.col("s_nationkey").alias("nationkey"),
    )
    return c.unionByName(s, allowMissingColumns=True)


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_except(spark, t):
    """O5: nation keys with customers but no suppliers.

    ``subtract`` is Spark's EXCEPT DISTINCT — any key present on the
    supplier side is removed entirely (``exceptAll`` would be bag
    difference, which is NOT the SQL EXCEPT semantics).
    """
    c = t["customer"].select(F.col("c_nationkey").alias("nationkey"))
    s = t["supplier"].select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "topk_keyset_page",
    oracle="""
    WITH ranked AS (
      SELECT o_orderkey, o_custkey,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
      FROM orders
    ), page1 AS (
      SELECT * FROM ranked ORDER BY cents DESC, o_orderkey LIMIT 20
    ), anchor AS (
      SELECT cents AS a_cents, o_orderkey AS a_key FROM page1
      ORDER BY cents, o_orderkey DESC LIMIT 1
    )
    SELECT r.o_orderkey, r.o_custkey, r.cents
    FROM ranked r, anchor
    WHERE r.cents < a_cents
       OR (r.cents = a_cents AND r.o_orderkey > a_key)
    ORDER BY r.cents DESC, r.o_orderkey
    LIMIT 20
    """,
)
def topk_keyset_page(spark, t):
    """Keyset (seek) pagination — page 2 of the order leaderboard via
    a WHERE-anchor on page 1's last row, never OFFSET.

    OFFSET n is the pagination scale-trap: the engine must compute
    and DISCARD the first n rows of a global order, so page p costs
    O(p·k) — and Spark's sort for it is a full exchange.  Keyset
    instead filters PAST the anchor tuple ((cents, key) strictly
    after page 1's last, in the total order) and takes a fresh top-k:
    both pages are TakeOrderedAndProject over a pushed-down-filterable
    scan — page 1000 costs the same as page 1.  The anchor is read
    from the engine's own page-1 result (1 driver row — the same
    cursor a paginating service holds); the total order (cents DESC,
    key) makes pages deterministic and gap-free, which the oracle
    pins by reproducing both hops.  At 100 TB this is the only
    pagination that works; the equivalent for time-series is the
    (ts, id) cursor every changelog reader uses.
    """
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    ranked = t["orders"].select(
        "o_orderkey", "o_custkey", cents.alias("cents")
    )
    page1 = ranked.orderBy(F.col("cents").desc(), "o_orderkey").limit(20)
    anchor = page1.orderBy("cents", F.col("o_orderkey").desc()).limit(1).collect()[0]
    return (
        ranked.where(
            (F.col("cents") < anchor.cents)
            | ((F.col("cents") == anchor.cents) & (F.col("o_orderkey") > anchor.o_orderkey))
        )
        .orderBy(F.col("cents").desc(), "o_orderkey")
        .limit(20)
    )
