"""Window-function operators (SURVEY.md §2.5, W1–W5).

Determinism rule: every window ORDER BY carries a unique tie-break
column (orderkey / partkey / event_id) — rank functions and frames
are only hash-comparable when the ordering is total.

Scale note: a window shuffles on its partition key once; all five
operators here partition on a high-cardinality key (custkey, brand,
user_id) or pre-aggregate to tiny cardinality first (W4), so no
single partition concentrates the data.  W1 additionally benefits
from InferWindowGroupLimit (Spark ≥3.5): the rank filter is pushed
below the shuffle as a per-partition top-k.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from tweetdb_spark.registry import query


@query(
    "win_rank_topk",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
)
def win_rank_topk(spark, t):
    """W1: top-3 orders per customer by totalprice (per-group top-k)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )


@query(
    "win_rank_topk_agg",
    oracle="""
    SELECT o_custkey, count(*) AS n_top,
           ROUND(SUM(o_totalprice), 2) AS top_value
    FROM (
      SELECT o_custkey, o_totalprice,
             row_number() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
             ) AS rn
      FROM orders
    ) WHERE rn <= 3
    GROUP BY o_custkey
    """,
)
def win_rank_topk_agg(spark, t):
    """W1's aggregated twin: count + sum of each customer's top-3 set.

    Benchmark attribution: win_rank_topk's cost at scale is dominated
    by MATERIALIZING ~3 rows per customer (linear in customers), not
    by the one custkey shuffle — this twin runs the identical
    window-and-filter pipeline but collapses the output to one row per
    customer, so the sf-ladder difference between the two isolates
    result materialization from shuffle cost (SCALE.md explains the
    6.3× sf1 step).  Same WindowGroupLimit pre-pruning applies.
    """
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t["orders"]
        .select("o_custkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= 3)
        .groupBy("o_custkey")
        .agg(
            F.count("*").alias("n_top"),
            F.round(F.sum("o_totalprice"), 2).alias("top_value"),
        )
    )


@query(
    "win_rank_dense",
    oracle="""
    SELECT p_partkey, p_brand, p_retailprice,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           ntile(4) OVER w AS quartile
    FROM part
    WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    """,
)
def win_rank_dense(spark, t):
    """W2: rank / dense_rank / percent_rank / ntile over a total order.

    percent_rank is (rank-1)/(n-1): an exact small-integer division,
    bit-identical across engines — no rounding needed.
    """
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return t["part"].select(
        "p_partkey",
        "p_brand",
        "p_retailprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "win_lag_lead",
    oracle="""
    SELECT event_id, user_id, ts,
           (epoch_us(ts) - epoch_us(lag(ts) OVER w)) / 1000000.0 AS gap_sec,
           epoch_us(lead(ts) OVER w) - epoch_us(ts) AS lead_gap_us
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id)
    """,
)
def win_lag_lead(spark, t):
    """W3: per-user inter-event gap (sessionization precursor).

    Gap computed on integer epoch-µs then divided by 1e6 — exact in
    both engines (no float timestamp arithmetic).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    return t["events"].select(
        "event_id",
        "user_id",
        "ts",
        ((us - F.unix_micros(F.lag("ts").over(w))) / 1000000.0).alias("gap_sec"),
        (F.unix_micros(F.lead("ts").over(w)) - us).alias("lead_gap_us"),
    )


@query(
    "win_first_last",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           LAST_VALUE(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_price,
           NTH_VALUE(o_totalprice, 2) OVER w AS second_price
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate NULLS FIRST, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
)
def win_first_last(spark, t):
    """first_value / last_value / nth_value over a full-partition frame.

    The frame must be explicitly UNBOUNDED FOLLOWING for last/nth:
    the default frame ends at CURRENT ROW, which silently turns
    last_value into "current value" — a classic window footgun, pinned
    identically on both engines here.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w).alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
    )


@query(
    "win_frame_rows",
    oracle="""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS d,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT d, revenue,
           -- mean via rounded-sum/count, NOT ROUND(AVG(..)): dividing
           -- by 7 lands on half-cent boundaries where 1-ulp FP
           -- accumulation differences flip the rounding between
           -- engines (r11 NULL-survey exposed 4 such rows; the same
           -- discipline as events_sliding, SURVEY.md §5)
           FLOOR(ROUND(SUM(revenue) OVER w, 2) * 100
                 / COUNT(revenue) OVER w) / 100 AS ma7
    FROM daily
    WINDOW w AS (ORDER BY d NULLS FIRST ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
    """,
)
def win_frame_rows(spark, t):
    """W4: 7-row centered moving average of daily revenue.

    Pre-aggregates to one row per day (tiny) before the unpartitioned
    window — the global window only ever sees ~365×years rows, so the
    single-partition window stage is safe at any input scale.
    """
    daily = (
        t["orders"]
        .groupBy(F.date_trunc("day", "o_orderdate").alias("d"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue"))
    )
    w = Window.orderBy("d").rowsBetween(-3, 3)
    # rounded-sum/count mean (see oracle comment): sums of 2-decimal
    # values are FP-exact, so both engines floor the same integer
    ma7 = (
        F.floor(
            F.round(F.sum("revenue").over(w), 2) * 100
            / F.count("revenue").over(w)
        )
        / 100
    )
    return daily.select("d", "revenue", ma7.alias("ma7"))


@query(
    "win_frame_range",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           ROUND(SUM(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate NULLS FIRST, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ), 2) AS cum_spend
    FROM orders
    """,
)
def win_frame_range(spark, t):
    """W5: running cumulative spend per customer (unbounded-preceding frame)."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.round(F.sum("o_totalprice").over(w), 2).alias("cum_spend"),
    )


@query(
    "win_distribution",
    oracle="""
    SELECT o_orderstatus, o_orderkey,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM orders
    WINDOW w AS (
      -- NULLS FIRST: a NULL price must rank first like Spark's ASC
      -- default, else every row's percentile shifts (r11 NULL survey)
      PARTITION BY o_orderstatus
      ORDER BY o_totalprice NULLS FIRST, o_orderkey
    )
    """,
)
def win_distribution(spark, t):
    """Distribution window functions: percent_rank / cume_dist / ntile.

    The ranking-distribution surface (price percentile per status
    band).  The ORDER BY carries o_orderkey as a unique tie-break —
    ntile assigns by row position, so without it the quartile of tied
    prices would be engine-dependent.  Same single-shuffle profile as
    every other window: one exchange on the partition key.
    """
    w = Window.partitionBy("o_orderstatus").orderBy("o_totalprice", "o_orderkey")
    return t["orders"].select(
        "o_orderstatus",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@query(
    "win_rolling_quantile",
    oracle="""
    WITH cents AS (
      SELECT event_id, user_id, ts,
             CAST(ROUND(value * 100) AS BIGINT) AS cents
      FROM events WHERE user_id < 20
    )
    SELECT event_id, user_id,
           quantile_cont(cents, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
             ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
           ) AS rolling_median_cents
    FROM cents
    """,
)
def win_rolling_quantile(spark, t):
    """Rolling EXACT median over the trailing 10 events per user — the
    order-statistic window the frame suite (W4 rows / W5 range) left
    out, and the shape behind rolling-median latency monitors.

    ``percentile`` runs as a true window aggregate: each frame's
    values are collected per-frame inside the JVM — O(frame) memory,
    not O(partition).  Values are integer cents, so the p=0.5
    interpolation midpoint ((a+b)/2) is exactly representable and
    engine-identical; fractional quantiles of unrestricted doubles
    would differ in the last ulp across engines (the sketch trio
    handles those).  One shuffle on user_id; ordering is
    (ts, event_id) so ties are deterministic.  At 100 TB the rolling
    median is the state-heaviest window here (the frame re-sorts per
    row) — for wide frames switch to the mergeable quantile sketch
    (``sketch_quantile_grouped``), which this key's exactness is the
    ground truth for.
    """
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        t["events"]
        .where(F.col("user_id") < 20)
        .select("event_id", "user_id", "ts", cents.alias("cents"))
        .withColumn(
            "rolling_median_cents",
            F.expr(
                "percentile(cents, 0.5) OVER ("
                "PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id "
                "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)"
            ),
        )
        .select("event_id", "user_id", "rolling_median_cents")
    )


@query(
    "win_count_distinct",
    oracle="""
    WITH marked AS (
      SELECT event_id, user_id, ts,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts NULLS FIRST, event_id) = 1
                  THEN 1 ELSE 0 END AS is_first
      FROM events WHERE user_id < 15
    )
    SELECT event_id, user_id,
           CAST(SUM(is_first) OVER (
             PARTITION BY user_id ORDER BY ts NULLS FIRST, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_to_date
    FROM marked
    """,
)
def win_count_distinct(spark, t):
    """Running COUNT(DISTINCT) over a window — the one aggregate SQL
    windows refuse directly (Spark raises on DISTINCT in a window
    frame) — via the first-occurrence decomposition: flag each
    (user, type)'s first event with one window, then a running SUM of
    flags in event order is exactly the distinct-types-seen-so-far.

    The engagement-breadth metric ("how many product areas has this
    user touched by time t"), and the general rewrite for any
    windowed distinct count: O(1) state per row versus the
    collect_set-over-frame alternative whose state grows with the
    frame.  Both windows partition by user_id, so ONE shuffle serves
    the pair (the second re-sorts within partitions only).  The
    oracle runs the identical decomposition — the rewrite itself is
    the thing under test.  At 100 TB this is the pattern that keeps
    funnel/breadth dashboards off of approx_count_distinct when
    exactness is required.
    """
    ev = t["events"].where(F.col("user_id") < 15)
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            "event_type",
            F.when(F.row_number().over(w_first) == 1, 1)
            .otherwise(0)
            .alias("is_first"),
        )
        .select(
            "event_id",
            "user_id",
            F.sum("is_first").over(w_run).alias("distinct_types_to_date"),
        )
    )
