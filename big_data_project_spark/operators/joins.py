"""Joins (SURVEY.md §2.3, J1-J10).

Reference grounding: the palette lookup ``np.take(color_map, indices)``
(``trainer/flax_inference.ipynb`` cell 8) is a 9-row dimension join (J1);
the missing Beam pipeline's t → t+6-months label pairing (``README.md:6``)
is an as-of join (J9); the driver's star schema mandates the rest.

Scale strategy per join:
  - J1: explicit ``broadcast()`` — dims (region/nation, the 9-class
    palette) are KBs; never shuffle the fact table for them.
  - J2/J3: shuffle equi-joins on the fact keys; AQE picks sort-merge vs
    broadcast per actual build-side size and splits skewed partitions.
  - J7: cross joins only against provably tiny sides (BroadcastNestedLoop).
  - J8: range joins bounded by an equi prefix (orderkey) so Spark plans a
    hash join with a residual range filter — never an unbounded interval
    cross product.
  - J9: as-of via union + sorted window (one shuffle by key, linear merge)
    instead of join + per-row top-1 (quadratic per key at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

# --- J1: broadcast hash join against a small dimension ---------------------


@query(
    "j1_broadcast_dim_join",
    oracle="""
    SELECT r_name AS region_name, n_name AS nation_name, count(*) AS n_customers,
           round(sum(c_acctbal), 4) AS sum_balance
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def j1_broadcast_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 4).alias("sum_balance"),
        )
    )


# --- J2: shuffle (sort-merge) equi join on the fact keys -------------------


@query(
    "j2_orders_lineitem_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_lines,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY o_orderpriority
    """,
)
def j2_orders_lineitem_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        )
    )


# --- J3: multi-way star join (TPC-H Q5 shape) ------------------------------


@query(
    "j3_star_join_revenue",
    oracle="""
    SELECT n_name AS nation_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'AFRICA' AND o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY n_name
    """,
)
def j3_star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --- J4: outer joins -------------------------------------------------------


@query(
    "j4_left_outer_join",
    oracle="""
    SELECT c_custkey,
           CAST(count(o_orderkey) AS BIGINT) AS n_orders,
           round(coalesce(sum(o_totalprice), 0.0), 4) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
)
def j4_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 4).alias("total_spent"),
        )
    )


@query(
    "j4_full_outer_join",
    oracle="""
    SELECT coalesce(c.nation_key, s.nation_key) AS nation_key,
           coalesce(c.n_cust, 0) AS n_cust,
           coalesce(s.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey AS nation_key, count(*) AS n_cust FROM customer WHERE c_acctbal > 9000 GROUP BY 1) c
    FULL OUTER JOIN (SELECT s_nationkey AS nation_key, count(*) AS n_supp FROM supplier GROUP BY 1) s
    USING (nation_key)
    """,
)
def j4_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nation_key"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return c.join(s, "nation_key", "full_outer").select(
        "nation_key",
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


# --- J5: left semi join ----------------------------------------------------


@query(
    "j5_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
    """,
)
def j5_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


# --- J6: left anti join ----------------------------------------------------


@query(
    "j6_anti_join",
    oracle="""
    SELECT c_custkey, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
)
def j6_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_mktsegment")


# --- J7: cross join + theta predicate (BroadcastNestedLoopJoin) ------------


@query(
    "j7_cross_theta_join",
    oracle="""
    SELECT r_regionkey AS region_key, n_nationkey AS nation_key
    FROM region CROSS JOIN nation
    WHERE n_nationkey % 5 = r_regionkey AND n_nationkey != r_regionkey * 5
    """,
)
def j7_cross_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return (
        r.crossJoin(n)
        .filter(
            (F.col("n_nationkey") % 5 == F.col("r_regionkey"))
            & (F.col("n_nationkey") != F.col("r_regionkey") * 5)
        )
        .select(F.col("r_regionkey").alias("region_key"), F.col("n_nationkey").alias("nation_key"))
    )


# --- J8: range / interval join (equi prefix + range residual) --------------


@query(
    "j8_range_join",
    oracle="""
    SELECT o_orderpriority,
           count(*) AS n_fast_lines,
           round(avg(date_diff('day', o_orderdate, l_shipdate)), 4) AS avg_ship_days
    FROM orders JOIN lineitem
      ON o_orderkey = l_orderkey
     AND l_shipdate >= o_orderdate
     AND l_shipdate < o_orderdate + INTERVAL 30 DAY
    GROUP BY o_orderpriority
    """,
)
def j8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate >= o.o_orderdate)
            & (li.l_shipdate < o.o_orderdate + F.expr("INTERVAL 30 DAY")),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_fast_lines"),
            F.round(F.avg(F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))), 4).alias("avg_ship_days"),
        )
    )


# --- J9: as-of join (t → latest prior match; the reference's 6-month label
#     pairing, README.md:6). Implemented scale-first: union both sides,
#     one shuffle+sort per user, last_value(ignorenulls) carries the most
#     recent view forward — linear merge, no per-row top-1 subjoin. --------


@query(
    "j9_asof_join",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           v.ts AS last_view_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
)
def j9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.lit(None).cast("long").alias("event_id"),
        F.col("ts").alias("view_ts"), F.lit(0).alias("side"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.lit(None).cast("timestamp").alias("view_ts"), F.lit(1).alias("side"),
    )
    # views sort before purchases at equal ts (side 0 < 1) — matches DuckDB
    # ASOF's inclusive p.ts >= v.ts tie semantics.
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    merged = views.unionByName(purchases).withColumn(
        "last_view_ts", F.last("view_ts", ignorenulls=True).over(w)
    )
    return merged.filter(F.col("side") == 1).select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("last_view_ts")
    )


# --- J10: self join (same series at two times) -----------------------------


@query(
    "j10_self_join",
    oracle="""
    SELECT a.o_custkey AS cust_key,
           count(*) AS n_rapid_pairs
    FROM orders a JOIN orders b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND b.o_orderdate >= a.o_orderdate
     AND b.o_orderdate < a.o_orderdate + INTERVAL 7 DAY
    GROUP BY a.o_custkey
    """,
)
def j10_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    a = o.alias("a")
    b = o.alias("b")
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.col("b.o_orderdate") >= F.col("a.o_orderdate"))
            & (F.col("b.o_orderdate") < F.col("a.o_orderdate") + F.expr("INTERVAL 7 DAY")),
        )
        .groupBy(F.col("a.o_custkey").alias("cust_key"))
        .agg(F.count(F.lit(1)).alias("n_rapid_pairs"))
    )


# --- J8b: pure interval join via time-bucket binning ------------------------


@query(
    "j8_binned_interval_join",
    oracle="""
    WITH p AS (SELECT event_id, ts FROM events WHERE event_type = 'purchase'),
         e AS (SELECT event_id, ts FROM events WHERE event_type = 'error')
    SELECT CAST(date_trunc('hour', p.ts) AS TIMESTAMP) AS hour,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p JOIN e ON e.ts >= p.ts AND e.ts < p.ts + INTERVAL 10 MINUTE
    GROUP BY 1
    """,
)
def j8_binned_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join with NO equi-key (errors within 10 min after any
    purchase). Naively this is a BroadcastNestedLoopJoin — n² comparisons,
    the non-scalable plan. Binning converts it to an equi-join: bucket
    the right side by floor(ts/10min); each left row can only match
    buckets b and b+1, so explode the left into those two candidate
    buckets, hash-join on bucket, and re-apply the exact predicate as a
    residual filter. Identical result (same oracle as the naive form),
    shuffle-based plan — the standard interval-join rewrite at 100 TB.
    The no-nested-loop property is pinned in tests/test_plans.py."""
    ev = load_table(spark, sf_dir, "events")
    bin_s = 600  # = the interval width → exactly 2 candidate buckets
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("ts").alias("p_ts"),
        F.floor(F.unix_timestamp("ts") / bin_s).alias("b0"),
    )
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("ts").alias("e_ts"),
        F.floor(F.unix_timestamp("ts") / bin_s).alias("bucket"),
    )
    p_cand = p.withColumn(
        "bucket", F.explode(F.array(F.col("b0"), F.col("b0") + 1))
    )
    return (
        p_cand.join(e, "bucket")
        .filter(
            (F.col("e_ts") >= F.col("p_ts"))
            & (F.col("e_ts") < F.col("p_ts") + F.expr("INTERVAL 10 MINUTES"))
        )
        .groupBy(F.date_trunc("hour", F.col("p_ts")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# --- J11: null-safe equality join (<=>) -------------------------------------


@query(
    "j11_null_safe_join",
    oracle="""
    WITH c AS (
      SELECT c_custkey,
             CASE WHEN c_custkey % 10 = 0 THEN NULL ELSE c_nationkey END AS nk
      FROM customer
    ),
    n AS (
      SELECT n_nationkey AS nk, n_name FROM nation
      UNION ALL
      SELECT NULL, 'UNATTRIBUTED'
    )
    SELECT n.n_name,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM c JOIN n ON c.nk IS NOT DISTINCT FROM n.nk
    GROUP BY n.n_name
    """,
)
def j11_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark's ``eqNullSafe`` / SQL ``<=>``,
    DuckDB's IS NOT DISTINCT FROM): customers with a nulled-out nation
    key still match the synthesized UNATTRIBUTED dimension row instead
    of dropping out, the warehouse idiom for 'unknown member' rollups.
    NULL<=>NULL hashes like any other key, so the join stays a normal
    broadcast hash join — no null-bucket special-casing."""
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.when(F.col("c_custkey") % 10 == 0, F.lit(None))
        .otherwise(F.col("c_nationkey"))
        .alias("nk"),
    )
    n = (
        load_table(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("nk"), "n_name")
        .unionAll(
            spark.range(1).select(
                F.lit(None).cast("int").alias("nk"),
                F.lit("UNATTRIBUTED").alias("n_name"),
            )
        )
    )
    return (
        c.join(F.broadcast(n), c.nk.eqNullSafe(n.nk))
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# --- J12: interval-overlap join (interval × interval) -----------------------
#
# j8_binned_interval_join handles POINT-in-window; this is the general
# overlap join between two sets of variable-length intervals (temporal
# range intersection, the genomics/IoT shape).  Overlap predicate:
# a.start <= b.end AND b.start <= a.end.

_J12_EPOCH = "1992-01-01"
_J12_BUCKET_DAYS = 28  # ≥ max interval length (20d) → ≤2 buckets per interval


@query(
    "j12_interval_overlap_join",
    oracle=f"""
    WITH a AS (
      SELECT o_orderkey AS a_key,
             CAST(o_orderdate AS DATE) AS a_start,
             CAST(o_orderdate AS DATE) + INTERVAL (o_orderkey % 20 + 1) DAY AS a_end
      FROM orders WHERE o_orderkey % 37 = 0
    ),
    b AS (
      SELECT o_orderkey AS b_key,
             CAST(o_orderdate AS DATE) AS b_start,
             CAST(o_orderdate AS DATE) + INTERVAL (o_orderkey % 20 + 1) DAY AS b_end
      FROM orders WHERE o_orderkey % 37 = 1
    )
    SELECT strftime(a.a_start, '%Y-%m') AS month,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(date_diff('day',
                              greatest(a.a_start, CAST(b.b_start AS DATE)),
                              least(CAST(a.a_end AS DATE), CAST(b.b_end AS DATE))) + 1)
                AS BIGINT) AS overlap_days
    FROM a JOIN b
      ON a.a_start <= b.b_end AND b.b_start <= a.a_end
    GROUP BY 1
    """,
)
def j12_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval × interval overlap join via bucket binning: each interval
    explodes into the fixed-width time buckets it covers (bucket width ≥
    max interval length → at most 2 buckets per interval), the sides
    hash-join on bucket id, the exact overlap predicate re-applies as a
    residual, and pair-level DISTINCT removes double-counts from pairs
    sharing two buckets.  Same n²→equi rewrite as j8b generalized to
    two interval sides — no nested-loop join at any scale; the oracle
    states the naive theta join."""
    o = load_table(spark, sf_dir, "orders")
    epoch = F.lit(_J12_EPOCH).cast("date")

    def intervals(parity: int, side: str) -> DataFrame:
        d = o.filter(F.col("o_orderkey") % 37 == parity)
        start = F.col("o_orderdate").cast("date")
        end = F.date_add(start, (F.col("o_orderkey") % 20 + 1).cast("int"))
        return d.select(
            F.col("o_orderkey").alias(f"{side}_key"),
            start.alias(f"{side}_start"),
            end.alias(f"{side}_end"),
            F.floor(F.datediff(start, epoch) / _J12_BUCKET_DAYS).alias(f"{side}_b0"),
            F.floor(F.datediff(end, epoch) / _J12_BUCKET_DAYS).alias(f"{side}_b1"),
        )

    a = intervals(0, "a").withColumn(
        "bucket", F.explode(F.sequence(F.col("a_b0"), F.col("a_b1")))
    )
    b = intervals(1, "b").withColumn(
        "bucket", F.explode(F.sequence(F.col("b_b0"), F.col("b_b1")))
    )
    pairs = (
        a.join(b, "bucket")
        .filter(
            (F.col("a_start") <= F.col("b_end")) & (F.col("b_start") <= F.col("a_end"))
        )
        .select("a_key", "b_key", "a_start", "b_start", "a_end", "b_end")
        .distinct()
    )
    overlap = (
        F.datediff(
            F.least("a_end", "b_end"), F.greatest("a_start", "b_start")
        )
        + 1
    )
    return pairs.groupBy(F.date_format("a_start", "yyyy-MM").alias("month")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(overlap).cast("bigint").alias("overlap_days"),
    )


# --- J13: as-of NEAREST join (closest anchor either direction) --------------


@query(
    "j13_asof_nearest_join",
    oracle="""
    WITH m AS (
      SELECT user_id, ts, ts AS view_ts, 0 AS side, CAST(NULL AS BIGINT) AS event_id
      FROM events WHERE event_type = 'view'
      UNION ALL
      SELECT user_id, ts, CAST(NULL AS TIMESTAMP) AS view_ts, 1 AS side, event_id
      FROM events WHERE event_type = 'purchase'
    ),
    anch AS (
      SELECT *,
             last_value(view_ts IGNORE NULLS) OVER w_prev AS pv,
             first_value(view_ts IGNORE NULLS) OVER w_next AS nv
      FROM m
      WINDOW
        w_prev AS (PARTITION BY user_id ORDER BY ts, side
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id ORDER BY ts, side
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN pv IS NOT NULL AND (nv IS NULL
                     OR epoch_us(ts) - epoch_us(pv) <= epoch_us(nv) - epoch_us(ts))
                THEN pv ELSE nv END AS nearest_view_ts,
           CASE WHEN pv IS NULL AND nv IS NULL THEN NULL
                WHEN pv IS NOT NULL AND (nv IS NULL
                     OR epoch_us(ts) - epoch_us(pv) <= epoch_us(nv) - epoch_us(ts))
                THEN 'backward' ELSE 'forward' END AS direction,
           CASE WHEN pv IS NOT NULL AND (nv IS NULL
                     OR epoch_us(ts) - epoch_us(pv) <= epoch_us(nv) - epoch_us(ts))
                THEN (epoch_us(ts) - epoch_us(pv)) // 1000000
                ELSE (epoch_us(nv) - epoch_us(ts)) // 1000000 END AS gap_s
    FROM anch WHERE side = 1
    """,
)
def j13_asof_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join, direction=NEAREST (pandas merge_asof's third mode —
    sensor/label alignment where the closest reading wins regardless of
    side): each purchase pairs with its nearest view in TIME, backward
    or forward, ties to backward.  Same scale-first shape as j9: union
    both sides, ONE shuffle+sort per user, and BOTH anchors
    (last-prior + first-following view) ride the same sorted window
    pass — a linear merge, never a per-row top-1 subjoin and never the
    |purchases|×|views| candidate blow-up of a naive range join.  Gap
    arithmetic stays in integer microseconds so both engines agree
    exactly (§4.3)."""
    e = load_table(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("ts").alias("view_ts"),
        F.lit(0).alias("side"), F.lit(None).cast("long").alias("event_id"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.lit(None).cast("timestamp").alias("view_ts"),
        F.lit(1).alias("side"), "event_id",
    )
    # views sort before purchases at equal ts (side 0 < 1): an equal-ts
    # view is a gap-0 BACKWARD match, which wins every nearest contest,
    # so the forward window not seeing equal-ts views is unobservable
    w_prev = (
        Window.partitionBy("user_id").orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id").orderBy("ts", "side")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    anch = (
        views.unionByName(purchases)
        .select(
            "*",
            F.last("view_ts", ignorenulls=True).over(w_prev).alias("pv"),
            F.first("view_ts", ignorenulls=True).over(w_next).alias("nv"),
        )
        .filter(F.col("side") == 1)
    )
    gb = F.unix_micros("ts") - F.unix_micros("pv")
    gf = F.unix_micros("nv") - F.unix_micros("ts")
    use_b = F.col("pv").isNotNull() & (F.col("nv").isNull() | (gb <= gf))
    return anch.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(use_b, F.col("pv")).otherwise(F.col("nv")).alias("nearest_view_ts"),
        F.when(F.col("pv").isNull() & F.col("nv").isNull(), F.lit(None).cast("string"))
        .when(use_b, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
        F.when(use_b, F.expr("(unix_micros(ts) - unix_micros(pv)) div 1000000"))
        .otherwise(F.expr("(unix_micros(nv) - unix_micros(ts)) div 1000000"))
        .alias("gap_s"),
    )
