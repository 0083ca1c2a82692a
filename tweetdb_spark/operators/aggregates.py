"""Aggregation operators (SURVEY.md §2.4, A1–A9).

Spark-first notes (100 TB posture):
- Every ``groupBy().agg()`` here compiles to a two-phase
  HashAggregate (partial map-side combine → shuffle on group keys →
  final), so the shuffle carries pre-aggregated rows, not raw data.
- Low-cardinality group keys (returnflag×linestatus = 6 groups,
  event_type = 5) make the final stage trivially small at any scale;
  AQE coalesces the post-shuffle partitions.
- Float discipline: every float aggregate is rounded identically in
  the Spark plan and the DuckDB oracle (summation order differs
  between engines in the low bits; see SURVEY.md §5).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tweetdb_spark.registry import query


@query(
    "agg_global",
    oracle="""
    SELECT count(*) AS cnt,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
)
def agg_global(spark, t):
    """A1: global count/sum/avg/min/max over lineitem (no group keys).

    Single partial-agg per partition → 1-row final: no data shuffle at
    any scale (each task emits one accumulator row).
    """
    return t["lineitem"].agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


@query(
    "agg_grouped",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def agg_grouped(spark, t):
    """A2 (flagship): TPC-H Q1 pricing-summary shape.

    Scan with pushed predicate → partial hash agg (7 aggregates) →
    shuffle on 2 keys (6 groups) → final hash agg.  The shuffle moves
    ≤ 6 rows × partitions regardless of input scale.
    """
    li = t["lineitem"].where(F.col("l_shipdate") <= F.lit("2000-12-01"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_having",
    oracle="""
    SELECT event_type, count(*) AS cnt, ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    HAVING count(*) > 2000
    """,
)
def agg_having(spark, t):
    """A3: grouped counts with a post-aggregation filter (HAVING).

    The hashtag-count analog of the reference pipeline's entity
    tables.  Catalyst keeps the filter above the final agg (it
    references the aggregate), which is the only correct placement.
    """
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .where(F.col("cnt") > 2000)
    )


@query(
    "agg_distinct",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users, count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)
def agg_distinct(spark, t):
    """A4: exact count(DISTINCT) per group.

    Spark plans this as Expand + two-phase agg: dedup on
    (event_type, user_id) first, then count — the distinct shuffle is
    on the compound key, so skewed event_types still spread across
    partitions.
    """
    return t["events"].groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


@query("agg_approx_distinct", oracle=None)  # approx ≠ hash-comparable → rows-only
def agg_approx_distinct(spark, t):
    """A5: HLL++ approximate distinct users per event_type.

    The 100 TB path for A4: one pass, no Expand, fixed-size sketch per
    group mergeable map-side (rsd=0.02).  Deterministic for a given
    input but not equal to the exact count → rows-only check; A4 is
    the hash-checked exact twin.
    """
    return t["events"].groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.02).alias("approx_users"),
    )


@query(
    "sketch_distinct_merge",
    oracle="""
    SELECT count(DISTINCT user_id) AS exact_distinct,
           -- + the NULL-day shard when present: the engine shards by
           -- groupBy(day), where NULL is a group like any other, while
           -- COUNT(DISTINCT) would silently exclude it (r11 NULL
           -- survey; events with no timestamp still need A shard)
           CAST(count(DISTINCT CAST(ts AS DATE))
                + MAX(CASE WHEN ts IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_shards,
           TRUE AS merged_within_bound,
           TRUE AS single_within_bound
    FROM events
    """,
)
def sketch_distinct_merge(spark, t):
    """Two-level sketch rollup — THE incremental-distinct pattern at
    100 TB: build one HLL sketch per shard (here: per day; in
    production, per ingest partition, persisted alongside the data),
    then answer the global question by UNIONING the fixed-size
    sketches — never rescanning the shards.

    Why it matters at scale: a daily pipeline keeps a ~KB sketch per
    (day, dimension); "distinct users this quarter" becomes a merge of
    90 sketches instead of a 90-day scan, and backfilling one day
    re-sketches one shard.  The checked guarantee is the ERROR BOUND,
    not bitwise estimate equality: both the merged-path and the
    single-pass estimate must sit within 5% of the exact count
    (datasketches HLL_4 at default lgConfigK=12 gives ~1.6% RSE), and
    the oracle pins both booleans to TRUE so the driver's value-hash
    check verifies the bound every round alongside the exact distinct
    count.  Bitwise merged==single does NOT hold in general — the
    round-8 sf0.1 sweep caught exactly this: small per-day sketches
    stay in exact sparse/coupon mode, and the union gadget's
    promotion to dense HLL shifts the estimate slightly, while a
    single-pass sketch over the same data may stay sparse.  At sf0.01
    both paths were sparse-exact and the stricter claim was masked.
    Estimates themselves are engine-internal, hence not emitted as
    compared values.
    """
    ev = t["events"].select(
        F.to_date("ts").alias("day"), F.col("user_id")
    )
    per_shard = ev.groupBy("day").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_shard.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"),
        F.count("*").alias("n_shards"),
    )
    single = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("est"),
        F.countDistinct("user_id").alias("exact"),
    )
    m, s = merged.alias("m"), single.alias("s")
    within = lambda est: F.abs(est - F.col("s.exact")) <= 0.05 * F.col("s.exact")
    return m.crossJoin(s).select(  # two 1-row sides
        F.col("s.exact").alias("exact_distinct"),
        F.col("m.n_shards").alias("n_shards"),
        within(F.col("m.est")).alias("merged_within_bound"),
        within(F.col("s.est")).alias("single_within_bound"),
    )


# Portable Count-Min-Sketch parameters.  d=4 pairwise-independent rows
# of w=1024 counters; hashes are (((key % P)*A_j + B_j) % P) % w in
# plain BIGINT arithmetic so Spark and DuckDB compute bit-identical
# sketches (same portability discipline as the banded-MinHash oracle
# in llm/dedup.py).  The key is reduced mod P BEFORE the affine step:
# the sf1 fixture's replica-offset user_ids (~9e9) × A (~3.3e9)
# overflow int64 under ANSI mode — the ladder caught exactly that —
# and mod-first bounds the product at (P-1)·A < 3.3e15 for ANY
# non-negative BIGINT key.  Keys congruent mod P=1000003 share all 4
# rows, which only ever OVERcounts — the CMS upper-bound contract is
# unaffected.
_CMS_ROWS = [
    (0, 2654435761, 1),
    (1, 2246822519, 7),
    (2, 3266489917, 13),
    (3, 668265263, 31),
]
_CMS_P = 1000003
_CMS_W = 1024


def _cms_hashes(key_col):
    """4 (j, bucket) structs for one key — identical math to the oracle."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    ((key_col % _CMS_P) * F.lit(a) + F.lit(b))
                    % _CMS_P
                    % _CMS_W
                ).alias("bucket"),
            )
            for j, a, b in _CMS_ROWS
        ]
    )


_CMS_J_SQL = (
    "(VALUES (0, 2654435761, 1), (1, 2246822519, 7), "
    "(2, 3266489917, 13), (3, 668265263, 31)) AS j(j, a, b)"
)


@query(
    "sketch_cms_merge",
    oracle=f"""
    WITH h AS (
      SELECT e.user_id, j.j,
             (((e.user_id % {_CMS_P}) * j.a + j.b) % {_CMS_P}) % {_CMS_W}
               AS bucket
      FROM events e CROSS JOIN {_CMS_J_SQL}
    ), cms AS (
      SELECT j, bucket, count(*) AS c FROM h GROUP BY j, bucket
    ), probes AS (
      SELECT DISTINCT user_id FROM events WHERE user_id < 50
    ), ph AS (
      SELECT p.user_id, j.j,
             (((p.user_id % {_CMS_P}) * j.a + j.b) % {_CMS_P}) % {_CMS_W}
               AS bucket
      FROM probes p CROSS JOIN {_CMS_J_SQL}
    ), est AS (
      SELECT ph.user_id, min(cms.c) AS cms_est
      FROM ph JOIN cms USING (j, bucket) GROUP BY ph.user_id
    ), exact AS (
      SELECT user_id, count(*) AS exact_cnt FROM events
      WHERE user_id < 50 GROUP BY user_id
    )
    SELECT est.user_id,
           CAST(est.cms_est AS BIGINT) AS cms_est,
           CAST(exact.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(est.cms_est - exact.exact_cnt AS BIGINT) AS overcount
    FROM est JOIN exact USING (user_id)
    """,
)
def sketch_cms_merge(spark, t):
    """Mergeable Count-Min frequency sketch, built shard-at-a-time and
    linearly merged — the frequency-question twin of
    ``sketch_distinct_merge``'s HLL pattern.

    The sketch is a d×w counter grid kept SPARSE as (j, bucket, count)
    rows: building it is one two-phase HashAggregate whose shuffle
    carries at most d·w = 4096 partially-combined rows per shard
    regardless of input size, and MERGING shards is counter addition —
    another tiny agg over ≤4096-row partials.  Point estimates join
    the probe keys' d buckets against the merged grid (a broadcast of
    ≤4096 rows) and take min_j.  At 100 TB: each ingest partition
    persists its own 32 KB grid; "how often did key X appear this
    quarter" sums 90 grids and probes — never rescans the quarter.

    Unlike the HLL pair (rows-only — engine-internal registers), this
    key is fully VALUE-HASH-CHECKED: the hash family is portable
    BIGINT arithmetic, the oracle builds the identical sketch in SQL,
    and the Spark side returns the per-day-merged grid's estimates —
    so the driver's hash equality simultaneously proves the sketch
    math AND that the shard-merge path is lossless (CMS is linear:
    merged counters == direct counters, checked value-for-value).
    Estimates are upper bounds (overcount ≥ 0 always; ~0 here since
    150 keys × 4 rows barely collide in w=1024).
    """
    ev = t["events"].select("user_id", F.to_date("ts").alias("day"))
    bucketed = ev.select(
        "day", F.explode(_cms_hashes(F.col("user_id"))).alias("h")
    ).select("day", "h.j", "h.bucket")
    # per-shard (per-day) sparse grids — the persistable partial state
    daily = bucketed.groupBy("day", "j", "bucket").agg(
        F.count("*").alias("c")
    )
    # linear merge: counter addition across shards
    merged = daily.groupBy("j", "bucket").agg(F.sum("c").alias("c"))
    probes = (
        t["events"].select("user_id").where(F.col("user_id") < 50).distinct()
    )
    probe_h = probes.select(
        "user_id", F.explode(_cms_hashes(F.col("user_id"))).alias("h")
    ).select("user_id", "h.j", "h.bucket")
    est = (
        probe_h.join(F.broadcast(merged), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").alias("cms_est"))
    )
    exact = (
        t["events"]
        .where(F.col("user_id") < 50)
        .groupBy("user_id")
        .agg(F.count("*").alias("exact_cnt"))
    )
    return est.join(exact, "user_id").select(
        "user_id",
        "cms_est",
        "exact_cnt",
        (F.col("cms_est") - F.col("exact_cnt")).alias("overcount"),
    )


_QSK_W = 256  # histogram buckets: width ≤ ~2.2 cents on this data


@query(
    "sketch_quantile_merge",
    oracle=f"""
    WITH ev AS (
      SELECT CAST(round(value * 100, 0) AS BIGINT) AS v,
             CAST(ts AS DATE) AS day
      FROM events
      -- quantiles are over VALUES: a NULL value has no rank, no
      -- bucket, and must not inflate N (r11 NULL survey; mirrored in
      -- the Spark body)
      WHERE value IS NOT NULL
    ), bounds AS (
      SELECT min(v) AS lo, max(v) AS hi, count(*) AS n,
             greatest(1, (max(v) - min(v) + {_QSK_W}) // {_QSK_W}) AS width
      FROM ev
    ), bucketed AS (
      SELECT ev.day, least({_QSK_W - 1}, (ev.v - b.lo) // b.width) AS bucket
      FROM ev, bounds b
    ), daily AS (
      SELECT day, bucket, count(*) AS c FROM bucketed GROUP BY day, bucket
    ), merged AS (
      SELECT bucket, CAST(SUM(c) AS BIGINT) AS c FROM daily GROUP BY bucket
    ), cum AS (
      SELECT bucket,
             CAST(SUM(c) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM merged
    ), qs AS (
      SELECT t.q, b.lo, b.width, (t.q * b.n + 99) // 100 AS k
      FROM (VALUES (25), (50), (75), (90), (99)) AS t(q), bounds b
    ), est AS (
      SELECT qs.q, qs.k, qs.width,
             qs.lo + (min(cum.bucket) + 1) * qs.width - 1 AS est_hi_cents
      FROM qs JOIN cum ON cum.cum >= qs.k
      GROUP BY qs.q, qs.k, qs.lo, qs.width
    ), vcum AS (
      SELECT v,
             CAST(SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM (SELECT v, count(*) AS c FROM ev GROUP BY v)
    ), ex AS (
      SELECT est.q, est.est_hi_cents, est.width,
             min(vcum.v) AS exact_cents
      FROM est JOIN vcum ON vcum.cum >= est.k
      GROUP BY est.q, est.est_hi_cents, est.width
    )
    SELECT CAST(q AS INT) AS q,
           CAST(est_hi_cents AS BIGINT) AS est_hi_cents,
           CAST(exact_cents AS BIGINT) AS exact_cents,
           CAST(est_hi_cents - exact_cents AS BIGINT) AS err_cents,
           TRUE AS within_width
    FROM ex
    """,
)
def sketch_quantile_merge(spark, t):
    """Mergeable quantile sketch — the third of the sketch trio
    (distinct→HLL in ``sketch_distinct_merge``, frequency→CMS in
    ``sketch_cms_merge``, quantiles→here): per-shard equi-width
    HISTOGRAMS, linearly merged, quantiles read off the cumulative
    counts with a resolution guarantee of one bucket width.

    All arithmetic is integer cents (the 2-decimal value column ×100)
    — bucket edges, ranks, estimates and errors are BIGINTs, so the
    sketch is bit-portable across engines with no FP-parity caveats
    at all, and the oracle rebuilds the identical sketch in SQL.  The
    per-day grids are the persistable partial state: ≤256 counters
    per shard whatever the row count, merged by addition (the same
    linearity argument the CMS hash check proves).  Quantile q's
    estimate is the hi edge of the first bucket whose cumulative
    count reaches rank k = ceil(q·N/100); the rank-k EXACT value
    (type-1, no interpolation — portable, unlike engine-specific
    interpolating percentiles) is computed from a distinct-value
    cumulative count as the built-in twin, and the oracle pins
    ``within_width`` to TRUE so the driver hash-checks the one-bucket
    error bound every round.  The ≤256-row and distinct-value
    cumulative windows are single-partition by construction —
    sketch-sized state, not data-sized (the distinct-cents domain is
    ≤~56k values on this data; at true 100 TB scale the exact-twin
    column drops and only the grid math remains).
    """
    from pyspark.sql.window import Window

    # value IS NOT NULL mirrors the oracle: a NULL value has no rank,
    # no bucket, and must not inflate the rank divisor N
    ev = t["events"].where(F.col("value").isNotNull()).select(
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    bounds = ev.agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count("*").alias("n"),
    ).withColumn(
        "width",
        F.expr(f"greatest(1L, (hi - lo + {_QSK_W}) DIV {_QSK_W})"),
    )
    evb = ev.crossJoin(F.broadcast(bounds))  # 1-row bounds side
    bucketed = evb.select(
        "day",
        F.expr(f"least({_QSK_W - 1}, (v - lo) DIV width)").alias("bucket"),
    )
    # per-shard grids — the persistable ≤256-counter partial state
    daily = bucketed.groupBy("day", "bucket").agg(F.count("*").alias("c"))
    merged = daily.groupBy("bucket").agg(F.sum("c").alias("c"))
    wcum = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = merged.select("bucket", F.sum("c").over(wcum).alias("cum"))
    qs = bounds.select(
        F.explode(
            F.array(*[F.lit(q) for q in (25, 50, 75, 90, 99)])
        ).alias("q"),
        "lo",
        "n",
        "width",
    ).withColumn("k", F.expr("(q * n + 99) DIV 100"))
    est = (
        qs.join(F.broadcast(cum), F.col("cum") >= F.col("k"))
        .groupBy("q", "k", "lo", "width")
        .agg(F.min("bucket").alias("b"))
        .select(
            "q",
            "k",
            "width",
            F.expr("lo + (b + 1) * width - 1").alias("est_hi_cents"),
        )
    )
    vc = ev.groupBy("v").agg(F.count("*").alias("c"))
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    vcum = vc.select("v", F.sum("c").over(wv).alias("cum"))
    ex = (
        est.join(F.broadcast(vcum), F.col("cum") >= F.col("k"))
        .groupBy("q", "est_hi_cents", "width")
        .agg(F.min("v").alias("exact_cents"))
    )
    err = F.col("est_hi_cents") - F.col("exact_cents")
    return ex.select(
        F.col("q").cast("int").alias("q"),
        "est_hi_cents",
        "exact_cents",
        err.alias("err_cents"),
        ((err >= 0) & (err < F.col("width"))).alias("within_width"),
    )


@query(
    "sketch_quantile_grouped",
    oracle=f"""
    WITH ev AS (
      SELECT event_type,
             CAST(round(value * 100, 0) AS BIGINT) AS v,
             CAST(ts AS DATE) AS day
      FROM events
      WHERE value IS NOT NULL  -- see sketch_quantile_merge (r11)
    ), bounds AS (
      SELECT event_type, min(v) AS lo, count(*) AS n,
             greatest(1, (max(v) - min(v) + {_QSK_W}) // {_QSK_W}) AS width
      FROM ev GROUP BY event_type
    ), bucketed AS (
      SELECT ev.event_type, ev.day,
             least({_QSK_W - 1}, (ev.v - b.lo) // b.width) AS bucket
      FROM ev JOIN bounds b USING (event_type)
    ), daily AS (
      SELECT event_type, day, bucket, count(*) AS c
      FROM bucketed GROUP BY event_type, day, bucket
    ), merged AS (
      SELECT event_type, bucket, CAST(SUM(c) AS BIGINT) AS c
      FROM daily GROUP BY event_type, bucket
    ), cum AS (
      SELECT event_type, bucket,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY bucket
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM merged
    ), qs AS (
      SELECT b.event_type, t.q, b.lo, b.width,
             (t.q * b.n + 99) // 100 AS k
      FROM (VALUES (50), (90), (99)) AS t(q), bounds b
    ), est AS (
      SELECT qs.event_type, qs.q, qs.k, qs.width,
             qs.lo + (min(cum.bucket) + 1) * qs.width - 1 AS est_hi_cents
      FROM qs JOIN cum ON cum.event_type = qs.event_type
                      AND cum.cum >= qs.k
      GROUP BY qs.event_type, qs.q, qs.k, qs.lo, qs.width
    ), vcum AS (
      SELECT event_type, v,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v
                               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
      FROM (SELECT event_type, v, count(*) AS c FROM ev
            GROUP BY event_type, v)
    ), ex AS (
      SELECT est.event_type, est.q, est.est_hi_cents, est.width,
             min(vcum.v) AS exact_cents
      FROM est JOIN vcum ON vcum.event_type = est.event_type
                        AND vcum.cum >= est.k
      GROUP BY est.event_type, est.q, est.est_hi_cents, est.width
    )
    SELECT event_type, CAST(q AS INT) AS q,
           CAST(est_hi_cents AS BIGINT) AS est_hi_cents,
           CAST(exact_cents AS BIGINT) AS exact_cents,
           TRUE AS within_width
    FROM ex
    """,
)
def sketch_quantile_grouped(spark, t):
    """``sketch_quantile_merge`` with a GROUP dimension — per-
    event_type p50/p90/p99, the shape production monitoring actually
    asks for ("p99 per service").  Each group gets its own integer-
    cents bucket range (per-group min/width from one aggregation,
    joined back broadcast), per-day grids now key on (group, day,
    bucket), and every window is PARTITIONED by the group — so unlike
    the global form's single-partition sketch windows, nothing here
    ever funnels to one task: state per group is ≤256 counters and
    groups spread across the cluster.  Same oracle-pinned one-bucket
    error bound, same exact type-1 twin per group.
    """
    from pyspark.sql.window import Window

    # value IS NOT NULL mirrors the oracle (same rationale as
    # sketch_quantile_merge: NULL values have no rank or bucket)
    ev = t["events"].where(F.col("value").isNotNull()).select(
        "event_type",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
    )
    bounds = ev.groupBy("event_type").agg(
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
        F.count("*").alias("n"),
    ).withColumn(
        "width",
        F.expr(f"greatest(1L, (hi - lo + {_QSK_W}) DIV {_QSK_W})"),
    )
    evb = ev.join(F.broadcast(bounds), "event_type")
    bucketed = evb.select(
        "event_type",
        "day",
        F.expr(f"least({_QSK_W - 1}, (v - lo) DIV width)").alias("bucket"),
    )
    daily = bucketed.groupBy("event_type", "day", "bucket").agg(
        F.count("*").alias("c")
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.sum("c").alias("c")
    )
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = merged.select(
        "event_type", "bucket", F.sum("c").over(wcum).alias("cum")
    )
    qs = bounds.select(
        "event_type",
        F.explode(F.array(F.lit(50), F.lit(90), F.lit(99))).alias("q"),
        "lo",
        "n",
        "width",
    ).withColumn("k", F.expr("(q * n + 99) DIV 100"))
    est = (
        qs.join(
            F.broadcast(cum.withColumnRenamed("event_type", "et2")),
            (F.col("event_type") == F.col("et2"))
            & (F.col("cum") >= F.col("k")),
        )
        .drop("et2")
        .groupBy("event_type", "q", "k", "lo", "width")
        .agg(F.min("bucket").alias("b"))
        .select(
            "event_type",
            "q",
            "k",
            "width",
            F.expr("lo + (b + 1) * width - 1").alias("est_hi_cents"),
        )
    )
    vc = ev.groupBy("event_type", "v").agg(F.count("*").alias("c"))
    wv = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    vcum = vc.select("event_type", "v", F.sum("c").over(wv).alias("cum"))
    ex = (
        est.join(
            F.broadcast(vcum.withColumnRenamed("event_type", "et3")),
            (F.col("event_type") == F.col("et3"))
            & (F.col("cum") >= F.col("k")),
        )
        .drop("et3")
        .groupBy("event_type", "q", "est_hi_cents", "width")
        .agg(F.min("v").alias("exact_cents"))
    )
    err = F.col("est_hi_cents") - F.col("exact_cents")
    return ex.select(
        "event_type",
        F.col("q").cast("int").alias("q"),
        "est_hi_cents",
        "exact_cents",
        ((err >= 0) & (err < F.col("width"))).alias("within_width"),
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT n_name, c_mktsegment,
           count(*) AS n_cust,
           ROUND(SUM(c_acctbal), 2) AS sum_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)
def agg_rollup(spark, t):
    """A6: ROLLUP (nation, mktsegment) — hierarchical subtotals.

    Broadcast the 25-row nation dim; rollup expands each input row to
    its 3 grouping levels before the (partial) agg.
    """
    joined = t["customer"].join(
        F.broadcast(t["nation"]),
        t["customer"].c_nationkey == t["nation"].n_nationkey,
    )
    return joined.rollup("n_name", "c_mktsegment").agg(
        F.count("*").alias("n_cust"),
        F.round(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


@query(
    "agg_cube",
    oracle="""
    SELECT lang, source, count(*) AS n_docs, ROUND(AVG(n_chars), 2) AS avg_chars
    FROM documents
    GROUP BY CUBE (lang, source)
    """,
)
def agg_cube(spark, t):
    """A7: CUBE (lang, source) over documents — all 4 grouping combos."""
    return t["documents"].cube("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT lang, source, count(*) AS n_docs
    FROM documents
    GROUP BY GROUPING SETS ((lang), (source), ())
    """,
)
def agg_grouping_sets(spark, t):
    """A8: explicit GROUPING SETS via the SQL entry point (E2)."""
    return spark.sql(
        """
        SELECT lang, source, count(*) AS n_docs
        FROM documents
        GROUP BY GROUPING SETS ((lang), (source), ())
        """
    )


@query(
    "agg_collect",
    oracle="""
    SELECT user_id,
           array_to_string(list_sort(array_agg(event_type)), '|') AS types,
           count(*) AS n
    FROM events
    GROUP BY user_id
    """,
)
def agg_collect(spark, t):
    """A9: per-user sorted array of event_types.

    ``array_sort(collect_list(...))`` — the sort makes the array a
    deterministic *value* (collect_list order is partition-dependent;
    never hash-compare an unsorted collect).  The array is then
    serialized with ``concat_ws('|')`` so the output column is a plain
    string: array cells crash the driver's pandas canonicalizer
    (CORRECTNESS_r01 ``agg_collect.err``: "unhashable numpy.ndarray"),
    and '|' never occurs in event_type values, so the encoding is
    lossless.
    """
    return t["events"].groupBy("user_id").agg(
        F.concat_ws("|", F.array_sort(F.collect_list("event_type"))).alias("types"),
        F.count("*").alias("n"),
    )


@query(
    "agg_incremental",
    oracle="""
    SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
           ROUND(SUM(value), 2) AS sum_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_incremental(spark, t):
    """Incremental aggregate maintenance: a materialized per-type
    aggregate over days < 15 is UPDATED with the day ≥ 15 delta by
    merging partial states — never rescanning the base.

    The oracle computes the full aggregate directly; the hash proves
    partial + delta ≡ full.  This works because count/sum are
    commutative monoids (Spark's own partial aggregation relies on
    the same property) — at 100 TB this is the nightly-refresh
    pattern: the base aggregate is thousands of times larger than a
    day's delta, and only the delta is scanned.  Same mechanics as
    HyperLogLog sketch merges (agg_approx_distinct) and per-partition
    JDBC upserts (sink_jdbc_batch).
    """
    cut = F.lit("2024-01-15 00:00:00").cast("timestamp")
    partial = lambda df: df.groupBy("event_type").agg(  # noqa: E731
        F.count("*").alias("cnt"), F.sum("value").alias("sv")
    )
    # p / NOT-p does not cover NULL: a NULL ts satisfies neither
    # `ts < cut` nor `ts >= cut`, silently dropping the row from BOTH
    # partials while the oracle's full aggregate keeps it (r11 NULL
    # survey).  Unknown-time rows are assigned to the base partition —
    # any deterministic side works, it just must be exactly one.
    base = partial(
        t["events"].where((F.col("ts") < cut) | F.col("ts").isNull())
    )
    delta = partial(t["events"].where(F.col("ts") >= cut))
    return (
        base.unionByName(delta)
        .groupBy("event_type")
        .agg(F.sum("cnt").alias("cnt"), F.round(F.sum("sv"), 2).alias("sum_value"))
    )


@query(
    "agg_top_freq",
    oracle="""
    SELECT l_partkey, cnt FROM (
      SELECT l_partkey, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY l_partkey
    ) ORDER BY cnt DESC, l_partkey LIMIT 20
    """,
)
def agg_top_freq(spark, t):
    """Exact heavy hitters: top-20 part keys by line count.

    Two-phase hash aggregate then TakeOrderedAndProject — the per-key
    counts never leave the executors unsorted; only 20 rows reach the
    driver.  Deterministic tie-break on the key keeps it hash-checkable.
    Exact twin of agg_approx_top_freq (the sketch path for when the
    key cardinality itself is too big to hash-aggregate comfortably).
    """
    return (
        t["lineitem"]
        .groupBy("l_partkey")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "l_partkey")
        .limit(20)
    )


@query("agg_approx_top_freq", oracle=None)  # sketch: tie ORDER engine-specific
def agg_approx_top_freq(spark, t):
    """Approximate heavy hitters via Spark's approx_top_k sketch.

    One pass, fixed memory (64 Ki-slot sketch), mergeable across
    partitions — the 100 TB form of agg_top_freq when the group-by
    cardinality (URLs, user ids) is itself too large to materialize.
    Here the sketch is far larger than the 2 000 distinct keys, so
    counts are EXACT and tests assert the (item, count) multiset
    matches the exact twin; only the tie ORDER among equal counts is
    engine-specific, hence rows-only.
    """
    return (
        t["lineitem"]
        .selectExpr("inline(approx_top_k(l_partkey, 20, 65536))")
        .select(
            F.col("item").alias("l_partkey"),
            F.col("count").alias("cnt"),
        )
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             count(DISTINCT user_id) AS n_daily
      FROM events GROUP BY 1
    ), total AS (
      SELECT count(DISTINCT user_id) AS direct_total FROM events
    )
    SELECT CAST(day AS TIMESTAMP) AS day, n_daily,
           direct_total AS merged_total, direct_total,
           TRUE AS merge_lossless
    FROM daily CROSS JOIN total
    """,
)
def agg_bitmap_distinct(spark, t):
    """EXACT mergeable distinct rollup — the bitmap twin of
    ``sketch_distinct_merge``'s HLL: per-day user-id SETS are the
    persistable partial state, and the month total is their union,
    never a re-scan of raw events.

    The per-day state here is a ``collect_set`` (partial-combined
    map-side, so the shuffle carries <= NDV ids per day, not raw
    events); the rollup unions the day sets (``flatten`` +
    ``array_distinct``) and its cardinality is pinned EQUAL to the
    direct single-pass ``countDistinct`` by the ``merge_lossless``
    column the oracle fixes at TRUE — the driver hash-checks the
    union math every round.  At 100 TB, int-keyed sets become roaring
    bitmaps (same algebra: union is OR, cardinality is popcount) and
    each day's bitmap is KBs on disk; when even that is too wide, the
    HLL tier answers with a bounded error.  This key documents the
    exact end of that spectrum and proves the merge identity the
    compressed forms rely on.
    """
    daily = (
        t["events"]
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.collect_set("user_id").alias("users"))
    )
    merged = daily.agg(
        F.size(F.array_distinct(F.flatten(F.collect_list("users")))).cast(
            "long"
        ).alias("merged_total")
    )
    direct = t["events"].agg(
        F.countDistinct("user_id").alias("direct_total")
    )
    return (
        daily.select("day", F.size("users").cast("long").alias("n_daily"))
        .crossJoin(F.broadcast(merged))
        .crossJoin(F.broadcast(direct))
        .withColumn(
            "merge_lossless", F.col("merged_total") == F.col("direct_total")
        )
    )


_KMV_K = 64
_KMV_P = 2147483647
_KMV_H = "((({u} % 2147483647) * 2654435761) % 2147483647)"


@query(
    "sketch_kmv_intersect",
    oracle=f"""
    WITH a_users AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
    ), b_users AS (
      SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ), ha AS (
      SELECT {_KMV_H.format(u='user_id')} AS h FROM a_users
    ), hb AS (
      SELECT {_KMV_H.format(u='user_id')} AS h FROM b_users
    ), kmva AS (
      SELECT h FROM ha ORDER BY h LIMIT {_KMV_K}
    ), kmvb AS (
      SELECT h FROM hb ORDER BY h LIMIT {_KMV_K}
    ), kmvu AS (
      SELECT h FROM (SELECT h FROM kmva UNION SELECT h FROM kmvb)
      ORDER BY h LIMIT {_KMV_K}
    ), esta AS (
      SELECT CASE WHEN count(*) < {_KMV_K} THEN count(*) * 1.0
                  ELSE CAST({_KMV_K} - 1 AS BIGINT) * {_KMV_P} * 1.0 / MAX(h) END AS est_a
      FROM kmva
    ), estb AS (
      SELECT CASE WHEN count(*) < {_KMV_K} THEN count(*) * 1.0
                  ELSE CAST({_KMV_K} - 1 AS BIGINT) * {_KMV_P} * 1.0 / MAX(h) END AS est_b
      FROM kmvb
    ), estu AS (
      SELECT CASE WHEN count(*) < {_KMV_K} THEN count(*) * 1.0
                  ELSE CAST({_KMV_K} - 1 AS BIGINT) * {_KMV_P} * 1.0 / MAX(h) END AS est_union,
             count(*) AS nu
      FROM kmvu
    ), jac AS (
      SELECT count(*) * 1.0 AS n_both
      FROM kmvu
      WHERE h IN (SELECT h FROM kmva) AND h IN (SELECT h FROM kmvb)
    ), exact AS (
      SELECT count(*) AS exact_intersect
      FROM a_users WHERE user_id IN (SELECT user_id FROM b_users)
    )
    SELECT ROUND(est_a, 3) + 0 AS est_a,
           ROUND(est_b, 3) + 0 AS est_b,
           ROUND(est_union, 3) + 0 AS est_union,
           ROUND(n_both / nu * est_union, 3) + 0 AS est_intersect,
           exact_intersect,
           ABS(n_both / nu * est_union - exact_intersect)
             <= GREATEST(0.5 * exact_intersect, 8) AS within_bound
    FROM esta, estb, estu, jac, exact
    """,
)
def sketch_kmv_intersect(spark, t):
    """KMV (k-minimum-values) sketch — the set-OPERATION estimator the
    sketch family needs: HLL unions losslessly but cannot intersect;
    KMV supports intersection/Jaccard because the k smallest hash
    values are a uniform SAMPLE of the set.

    Per side, keep the k=64 smallest portable hashes of the distinct
    member ids (a TakeOrdered — never a global sort); cardinality is
    (k−1)·p / h_(k), exact when the set is smaller than k.  The UNION
    sketch is the k smallest of the merged sketches (mergeable, like
    every sketch in this family), Jaccard is the fraction of union-
    sketch values present in BOTH sides, and the intersection
    estimate is Jaccard × est(|A∪B|) — the standard KMV algebra.
    Every step is deterministic integer/IEEE arithmetic, so the
    ORACLE replicates the whole sketch and the ``within_bound``
    column pins the estimate against the exact intersection — sketch
    math, merge, and error bound all value-hash-checked.  At 100 TB:
    per-shard KMV sketches are k×8 bytes, merge is k-smallest-of-
    unions, and audience-overlap questions ("clickers ∩ purchasers")
    read sketches, never re-scan either side.
    """
    k, p = _KMV_K, _KMV_P

    def kmv(event_type):
        return (
            t["events"]
            .where(F.col("event_type") == event_type)
            .select("user_id")
            .distinct()
            .select(F.expr(_KMV_H.format(u="user_id")).alias("h"))
            .orderBy("h")
            .limit(k)
        )

    kmva, kmvb = kmv("click"), kmv("purchase")
    kmvu = kmva.union(kmvb).distinct().orderBy("h").limit(k)

    def est(df, name, extra=None):
        cnt, mx = F.count("*"), F.max("h")
        e = F.when(cnt < k, cnt.cast("double")).otherwise(
            F.lit((k - 1) * p) * 1.0 / mx
        )
        aggs = [e.alias(name)]
        if extra:
            aggs.append(cnt.alias(extra))
        return df.agg(*aggs)

    n_both = (
        kmvu.join(kmva, "h")
        .join(kmvb, "h")
        .agg(F.count("*").cast("double").alias("n_both"))
    )
    a_users = (
        t["events"].where(F.col("event_type") == "click")
        .select("user_id").distinct()
    )
    b_users = (
        t["events"].where(F.col("event_type") == "purchase")
        .select("user_id").distinct()
    )
    exact = a_users.join(b_users, "user_id").agg(
        F.count("*").alias("exact_intersect")
    )
    est_i = F.col("n_both") / F.col("nu") * F.col("est_union")
    return (
        est(kmva, "est_a")
        .crossJoin(est(kmvb, "est_b"))
        .crossJoin(est(kmvu, "est_union", extra="nu"))
        .crossJoin(n_both)
        .crossJoin(exact)
        .select(
            (F.round("est_a", 3) + 0).alias("est_a"),
            (F.round("est_b", 3) + 0).alias("est_b"),
            (F.round("est_union", 3) + 0).alias("est_union"),
            (F.round(est_i, 3) + 0).alias("est_intersect"),
            "exact_intersect",
            (
                F.abs(est_i - F.col("exact_intersect"))
                <= F.greatest(0.5 * F.col("exact_intersect"), F.lit(8.0))
            ).alias("within_bound"),
        )
    )


@query(
    "agg_bitwise",
    oracle="""
    SELECT event_type,
           bit_or(user_id) AS bits_or,
           bit_and(user_id) AS bits_and,
           bit_xor(user_id) AS bits_xor
    FROM events GROUP BY event_type
    """,
)
def agg_bitwise(spark, t):
    """Bitwise aggregate family (bit_or / bit_and / bit_xor) — the
    flag-mask rollup: OR unions capability bits, AND intersects them,
    XOR is the parity/checksum fold.

    All three are commutative/associative single-word states, so they
    partial-combine map-side like sum — the cheapest aggregates in
    the engine and the primitive under bitmap indexes and permission-
    mask rollups.  XOR over an id column is also the classic
    constant-space "find the unpaired row" checksum used in
    replication audits (``table_diff``'s cheap cousin).
    """
    return t["events"].groupBy("event_type").agg(
        F.bit_or("user_id").alias("bits_or"),
        F.bit_and("user_id").alias("bits_and"),
        F.bit_xor("user_id").alias("bits_xor"),
    )


@query(
    "agg_string_ordered",
    oracle="""
    SELECT n_nationkey AS nationkey,
           string_agg(c_mktsegment, '|' ORDER BY c_mktsegment, c_custkey)
             AS segs,
           string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment)
             AS seg_set
    FROM nation JOIN customer ON c_nationkey = n_nationkey
    WHERE c_custkey <= 200
    GROUP BY n_nationkey
    """,
)
def agg_string_ordered(spark, t):
    """LISTAGG (SQL:2016) with an explicit WITHIN-GROUP order — the
    string-concatenation aggregate made DETERMINISTIC, which is the
    entire game: unordered listagg output depends on partitioning and
    merge order, so it can never be reproduced, diffed, or
    hash-checked.

    Spark 4's ``listagg`` + an ORDER BY inside the aggregate gives a
    stable total order (segment, then custkey as tiebreak); the
    DISTINCT variant deduplicates before concatenating.  Both engines
    agree byte-for-byte because the order is total — exactly the
    property ``sort_multicol`` pins for sorts, applied to aggregate
    internals.  At 100 TB concatenated strings are a presentation
    aggregate (report cells, label lists) — the sort is per-group and
    map-side partials carry ordered runs; for analytical reuse keep
    ``agg_collect``'s array form instead of re-splitting strings.
    """
    j = (
        t["nation"]
        .join(
            t["customer"].where(F.col("c_custkey") <= 200),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    return j.groupBy(F.col("n_nationkey").alias("nationkey")).agg(
        F.expr(
            "listagg(c_mktsegment, '|') WITHIN GROUP "
            "(ORDER BY c_mktsegment, c_custkey)"
        ).alias("segs"),
        F.expr(
            "listagg(DISTINCT c_mktsegment, ',') WITHIN GROUP "
            "(ORDER BY c_mktsegment)"
        ).alias("seg_set"),
    )


@query(
    "agg_bitmap_native",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', ts) AS day,
             count(DISTINCT user_id) AS n_daily
      FROM events GROUP BY 1
    ), total AS (
      SELECT count(DISTINCT user_id) AS n_total FROM events
    )
    SELECT CAST(day AS TIMESTAMP) AS day, n_daily,
           n_total, TRUE AS rollup_lossless
    FROM daily CROSS JOIN total
    """,
)
def agg_bitmap_native(spark, t):
    """The BUILT-IN bitmap aggregate path (Spark 3.5's
    ``bitmap_construct_agg`` / ``bitmap_or_agg`` / ``bitmap_count``)
    — real packed bitmaps where ``agg_bitmap_distinct`` modeled the
    algebra with arrays.

    Ids are split into (bucket, bit-position) by the engine
    (``bitmap_bucket_number`` / ``bitmap_bit_position``, 2^15 bits
    per bucket), each (day, bucket) aggregates into a BINARY bitmap
    (4 KB max, set-bits packed), daily partials OR together with
    ``bitmap_or_agg``, and cardinality is ``bitmap_count`` — popcount
    on bytes, no set materialization anywhere.  The oracle pins
    per-day counts AND the OR-rollup total against plain
    count(DISTINCT), so the engine's bitmap algebra is value-hash-
    checked end-to-end.  At 100 TB this is the persistable exact-
    distinct state: per-(day, bucket) bitmap rows are KBs, rollups
    touch bitmaps never raw events, and the same state answers any
    date-range distinct question by OR-ing its days — the exact twin
    of ``sketch_distinct_merge``'s HLL with byte-packed storage
    replacing the array-set of ``agg_bitmap_distinct``.
    """
    ev = t["events"].selectExpr(
        "date_trunc('day', ts) AS day",
        "bitmap_bucket_number(user_id) AS bucket",
        "bitmap_bit_position(user_id) AS pos",
    )
    per_bucket = ev.groupBy("day", "bucket").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    daily = per_bucket.groupBy("day").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_daily")
    )
    total = (
        per_bucket.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(F.expr("sum(bitmap_count(bm))").alias("n_total"))
    )
    direct = t["events"].agg(F.countDistinct("user_id").alias("n_direct"))
    return (
        daily.crossJoin(F.broadcast(total))
        .crossJoin(F.broadcast(direct))
        .select(
            "day",
            "n_daily",
            "n_total",
            (F.col("n_total") == F.col("n_direct")).alias("rollup_lossless"),
        )
    )


@query(
    "pandas_api_bridge",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           -- COUNT(col), not count(*): pandas' named-agg "count" is
           -- the NON-NULL count — the second pandas-porting trap this
           -- row pins (with groupby dropna; r11 NULL survey)
           count(l_quantity) AS n_rows
    FROM lineitem
    WHERE l_shipdate <= DATE '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pandas_api_bridge(spark, t):
    """The third API surface over the same engine: pandas-API-on-Spark
    (``pyspark.pandas``) — a pandas-shaped groupby/agg that COMPILES
    INTO THE SAME CATALYST PLAN as the SQL/DataFrame forms (Q1's
    shape, reduced).

    Why it's worth a contract row: teams port pandas notebooks to the
    cluster by swapping the import, and the thing to verify is that
    the bridge is semantics-preserving and plan-clean — the oracle
    here is the plain SQL aggregate, so the whole translation
    (filter → boolean mask, groupby(as_index=False), named agg,
    type round-trip back to a Spark DataFrame) is value-hash-checked.
    At 100 TB the caveats are the docstring: avoid default-index
    materialization (use ``distributed`` index type or go through
    ``to_spark()`` as here), and remember ``.to_pandas()`` is a
    driver collect — the bridge is for LOGIC reuse, not for pulling
    data local.
    """
    import pyspark.pandas as ps

    psdf = t["lineitem"].select(
        "l_returnflag", "l_linestatus", "l_quantity", "l_shipdate"
    ).pandas_api()
    masked = psdf[psdf["l_shipdate"] <= "1998-09-02"]
    g = (
        # dropna=False: pandas groupby SILENTLY DROPS NULL group keys
        # by default — SQL GROUP BY (and therefore the oracle) keeps
        # them.  The exact porting trap this contract row exists to
        # verify (r11 NULL-survey catch).
        masked.groupby(["l_returnflag", "l_linestatus"], as_index=False, dropna=False)
        .agg(sum_qty=("l_quantity", "sum"), n_rows=("l_quantity", "count"))
    )
    out = g.to_spark()
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("long").alias("sum_qty"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )


@query(
    "agg_filtered",
    oracle="""
    SELECT c_mktsegment,
           count(*) AS n_orders,
           count(*) FILTER (WHERE o_orderpriority LIKE '1-%')
             AS n_urgent,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
             AS finished_cents,
           CAST(COALESCE(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                FILTER (WHERE o_orderdate >= DATE '1998-01-01'), 0) AS BIGINT)
             AS recent_cents
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def agg_filtered(spark, t):
    """SQL:2003 filtered aggregation — ``agg(...) FILTER (WHERE p)``:
    several differently-conditioned measures in ONE pass over one
    grouping, the idiomatic replacement for N self-joins or N
    CASE-WHEN pyramids.

    Each measure keeps its own predicate inside the aggregate, the
    scan happens once, and every partial still combines map-side —
    at 100 TB this is the difference between one shuffle and four
    (the pre-FILTER pattern was one scan per conditioned metric).
    A measure whose filter matches nothing yields NULL, COALESCEd
    where the report wants 0 — pinned by the oracle.  Money in exact
    integer cents, as everywhere.
    """
    j = t["orders"].join(
        t["customer"], F.col("o_custkey") == F.col("c_custkey")
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return j.groupBy("c_mktsegment").agg(
        F.count("*").alias("n_orders"),
        F.count(F.when(F.col("o_orderpriority").like("1-%"), 1)).alias(
            "n_urgent"
        ),
        F.sum(F.when(F.col("o_orderstatus") == "F", cents)).alias(
            "finished_cents"
        ),
        F.coalesce(
            F.sum(F.when(F.col("o_orderdate") >= "1998-01-01", cents)),
            F.lit(0),
        ).alias("recent_cents"),
    )


@query(
    "agg_multi_distinct_decomposed",
    oracle="""
    SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS distinct_users,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS distinct_days,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
             AS sum_cents
    FROM events GROUP BY event_type
    """,
)
def agg_multi_distinct_decomposed(spark, t):
    """Multi-DISTINCT aggregation WITHOUT Expand: N distinct measures
    decomposed into N dedup-aggregates joined on the group key.

    The naive form — ``groupBy(type).agg(count_distinct(user),
    count_distinct(day), count(*))`` — makes Catalyst plan an Expand
    node: every input row is replicated once per distinct column (+1
    for the plain measures), so the FIRST shuffle carries ~3× the
    input rows whatever the data's own cardinality.  (One distinct
    aggregate alone avoids Expand via the two-phase rewrite; it is
    the 2+ case that explodes — asserted both ways in
    tests/test_plans.py.)

    The decomposed form computes each distinct count as its own
    map-side-deduped two-phase aggregate — partial HashAggregate on
    (type, col) BEFORE its exchange, so the shuffle carries at most
    the distinct-pair count, not N, let alone 3N — and the plain
    measures as a plain aggregate, then joins the ≤|groups|-row
    results on the group key (broadcast-scale by construction: the
    grouping column has few values).  Three column-pruned scans of
    2-3 columns each replace one 3×-replicated shuffle; at 100 TB
    shuffle bytes are the scarce resource, scans are the cheap one,
    and AQE broadcasts the joins.  Sums are integer cents (the
    FP-parity rule), and the join keys are the group keys, so row
    multiplicity is provably 1:1:1.
    """
    ev = t["events"].select(
        "event_type",
        "user_id",
        F.to_date("ts").alias("day"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    plain = ev.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("cents").alias("sum_cents"),
    )
    # COUNT(DISTINCT x) excludes NULLs; a bare count("*") after
    # .distinct() would count a NULL x as one extra distinct value per
    # group.  Fixture-invisible today (user_id/ts are non-null), but the
    # decomposition must match the oracle's NULL semantics by
    # construction, not by fixture luck (round-10 verdict ask #7).
    du = (
        ev.where(F.col("user_id").isNotNull())
        .select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("distinct_users"))
    )
    dd = (
        ev.where(F.col("day").isNotNull())
        .select("event_type", "day")
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("distinct_days"))
    )
    # Left joins + coalesce: a group whose user_ids (or days) are ALL
    # NULL has no du/dd row, but the oracle still reports it with a
    # distinct count of 0 — an inner join would drop the group.  The
    # join is null-safe (<=>) because GROUP BY keeps a NULL group in
    # both engines and plain `=` would strand it; eqNullSafe on an
    # equi-key stays hash-join-able, so the broadcast plan is unchanged.
    du = du.withColumnRenamed("event_type", "et_u")
    dd = dd.withColumnRenamed("event_type", "et_d")
    return (
        plain.join(du, F.col("event_type").eqNullSafe(F.col("et_u")), "left")
        .join(dd, F.col("event_type").eqNullSafe(F.col("et_d")), "left")
        .select(
            "event_type",
            F.coalesce("distinct_users", F.lit(0).cast("bigint")).alias(
                "distinct_users"
            ),
            F.coalesce("distinct_days", F.lit(0).cast("bigint")).alias(
                "distinct_days"
            ),
            "n_events",
            "sum_cents",
        )
    )
