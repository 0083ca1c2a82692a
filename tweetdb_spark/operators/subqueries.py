"""Subquery operators: EXISTS, correlated scalar, and IN-subquery
shapes (TPC-H q4 / q17 / q18 analogues on the fixture schema).

Catalyst de-correlates all three into joins — EXISTS becomes a
left-semi join, the correlated scalar aggregate becomes an aggregate +
equi-join on the correlation key, IN becomes a semi join on the
subquery output — so none of them executes per-row subqueries.  That
rewrite is the entire 100 TB story: the naive interpretation is
O(rows × subquery) and the planned shape is one shuffle per join key.
tests/test_plans.py asserts the de-correlated plans are subquery-free.

Float-parity note: the correlated comparisons use AVG/SUM of
``l_quantity``, which is integral (1–50) — double sums of integers
are exact in any summation order, so predicate boundaries cannot flip
between engines.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetdb_spark.registry import query


@query(
    "subquery_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    """,
)
def subquery_exists(spark, t):
    """EXISTS subquery (q4 shape): orders with at least one line shipped
    after the order date, counted by priority.

    Expressed in SQL so Catalyst's RewritePredicateSubquery turns the
    EXISTS into a LEFT SEMI join on l_orderkey (+ the date filter as
    the join condition) — one fact shuffle, no per-order probe.
    """
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders
        WHERE EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
        )
        GROUP BY o_orderpriority
        """
    )


@query(
    "subquery_scalar_corr",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
           ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l1
    WHERE l_quantity < (
      SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = l1.l_partkey
    )
    """,
)
def subquery_scalar_corr(spark, t):
    """Correlated scalar subquery (q17 shape): lines whose quantity is
    under half their part's average quantity.

    Catalyst de-correlates into AVG-per-partkey + an equi-join back on
    l_partkey: two scans + one aggregate + one join, not one aggregate
    per outer row.  The predicate compares integral quantities against
    an exact average (integer-double sums), so both engines draw the
    same boundary.
    """
    return spark.sql(
        """
        SELECT CAST(count(*) AS BIGINT) AS n_small_lines,
               ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l1
        WHERE l_quantity < (
          SELECT 0.5 * AVG(l_quantity) FROM lineitem l2
          WHERE l2.l_partkey = l1.l_partkey
        )
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS n_big_orders
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING SUM(l_quantity) > 250
    )
    GROUP BY c_custkey, c_name
    """,
)
def subquery_in(spark, t):
    """IN subquery over an aggregated set (q18 shape): customers with
    bulk orders (total line quantity > 250).

    The IN list is an aggregate result, not a literal — Catalyst plans
    it as HAVING-filtered aggregate → LEFT SEMI join on o_orderkey.
    Quantity sums are exact (integral doubles), so the HAVING boundary
    is engine-stable.
    """
    return spark.sql(
        """
        SELECT c_custkey, c_name, CAST(count(*) AS BIGINT) AS n_big_orders
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        WHERE o_orderkey IN (
          SELECT l_orderkey FROM lineitem
          GROUP BY l_orderkey
          HAVING SUM(l_quantity) > 250
        )
        GROUP BY c_custkey, c_name
        """
    )


@query(
    "subquery_lateral",
    oracle="""
    SELECT n.n_name, c.c_name, c.c_acctbal
    FROM nation n,
    LATERAL (
      SELECT c_name, c_acctbal FROM customer
      WHERE c_nationkey = n.n_nationkey
      ORDER BY c_acctbal DESC, c_name
      LIMIT 2
    ) c
    """,
)
def subquery_lateral(spark, t):
    """LATERAL correlated subquery — top-2 customers by balance per
    nation, written as the SQL-standard lateral derived table (the
    form analysts port verbatim from Postgres/DuckDB).

    Catalyst plans the correlated LIMIT-per-outer-row as a join plus
    per-group limit — the same physical family as win_rank_topk's
    WindowGroupLimit — not 25 serial subquery executions; the
    dimension outer side broadcasts.  Deterministic: ties broken by
    c_name in the ORDER BY on both engines.
    """
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM nation n,
        LATERAL (
          SELECT c_name, c_acctbal FROM customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name
          LIMIT 2
        ) c
        """
    )


@query(
    "subquery_not_in",
    oracle="""
    WITH inner_keys AS (
      SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
               AS k
      FROM orders
    )
    SELECT
      (SELECT count(*) FROM customer
        WHERE c_custkey NOT IN (SELECT k FROM inner_keys)) AS n_not_in,
      (SELECT count(*) FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM inner_keys i
                          WHERE i.k = c.c_custkey)) AS n_not_exists,
      (SELECT count(*) FROM inner_keys WHERE k IS NULL) > 0
        AS inner_has_nulls
    """,
)
def subquery_not_in(spark, t):
    """NOT IN versus NOT EXISTS under NULLs — ANSI's sharpest
    three-valued-logic trap, and Spark's NULL-AWARE ANTI JOIN
    physical strategy.

    The inner key set is planted with NULLs (orderkey % 97 —
    documented, same policy as the imputation holes).  Under ANSI,
    ``x NOT IN (set containing NULL)`` is never TRUE (it's FALSE or
    UNKNOWN), so ``n_not_in`` must be 0 while ``n_not_exists`` counts
    the genuinely unmatched customers — both engines agree because
    this is standard semantics, and the hash check pins Spark's
    null-aware rewrite to DuckDB's.  ``inner_has_nulls`` guards the
    test from becoming vacuous if the fixture changes.  Physically,
    Spark can only execute a null-aware anti join as a BROADCAST
    (NAAJ-flagged BroadcastHashJoin — asserted in tests/test_plans
    .py); at 100 TB a non-broadcastable inner side means rewriting to
    NOT EXISTS yourself after deciding what NULL should mean — which
    is precisely the decision this operator documents.
    """
    return spark.sql(
        """
        WITH inner_keys AS (
          SELECT CASE WHEN o_orderkey % 97 = 0 THEN NULL ELSE o_custkey END
                   AS k
          FROM orders
        )
        SELECT
          (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (SELECT k FROM inner_keys)) AS n_not_in,
          (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM inner_keys i
                              WHERE i.k = c.c_custkey)) AS n_not_exists,
          (SELECT count(*) FROM inner_keys WHERE k IS NULL) > 0
            AS inner_has_nulls
        """
    )
