"""Window functions (SURVEY.md §2.5, W1-W7).

Reference grounding: the reference's windowed computations are the spatial
Gaussian neighborhood smoothing (``trainer/flax_model.py:73, 88`` — W3's
1-D sliding-frame analog), the t → t+6-months forecast horizon
(``README.md:6`` — W2 lead / W7 range frames), and checkpoint keep-last-3
(``flax_model.py:377`` — W6 frame extremes).

Determinism: every ORDER BY carries a unique tie-break key; frame sums are
sequential within a partition so both engines add in the same order.
Scale: one shuffle per distinct partitionBy key set; unpartitioned windows
(o3-style global row_number) single-thread the sort and are kept to
dimension-sized inputs or replaced by zipWithIndex-style designs at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

# --- W1: row_number / rank / dense_rank ------------------------------------


@query(
    "w1_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment,
             c_custkey,
             round(c_acctbal, 4) AS acctbal,
             row_number() OVER w AS rn,
             rank()       OVER w AS rk,
             dense_rank() OVER w AS drk
      FROM customer
      WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
    )
    WHERE rn <= 5
    """,
)
def w1_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 4).alias("acctbal"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rk"),
            F.dense_rank().over(w).alias("drk"),
        )
        .filter(F.col("rn") <= 5)
    )


# --- W2: lag / lead (t → t+Δ pairing; per-user event deltas) ---------------


@query(
    "w2_lag_lead",
    oracle="""
    SELECT event_id, user_id,
           lead(event_id) OVER w AS next_event_id,
           lag(event_id)  OVER w AS prev_event_id,
           date_diff('microsecond', ts, lead(ts) OVER w) AS micros_to_next
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def w2_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lead("event_id").over(w).alias("next_event_id"),
        F.lag("event_id").over(w).alias("prev_event_id"),
        (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros(F.col("ts"))).alias("micros_to_next"),
    )


# --- W3: sliding frame agg — the Gaussian-smoothing 1-D analog
#     (flax_model.py:73, 88): neighborhood mean over a ±2 row frame. -------


@query(
    "w3_moving_average",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           round(avg(l_extendedprice) OVER (
             PARTITION BY l_suppkey
             ORDER BY l_orderkey, l_linenumber, l_extendedprice
             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING), 4) AS smoothed_price
    FROM lineitem
    """,
)
def w3_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned by supplier — the reference's smoothing is per patch,
    never across patches (flax_model.py:88), and an un-partitioned window
    would serialize the whole table through one task at scale.
    (l_orderkey, l_linenumber) is NOT unique in the fixtures, so the
    aggregated column itself joins the ORDER BY: frames become
    value-deterministic even under duplicate keys (§4.3.2)."""
    li = load_table(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
        .rowsBetween(-2, 2)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.round(F.avg("l_extendedprice").over(w), 4).alias("smoothed_price"),
    )


# --- W4: cumulative agg (running sum) --------------------------------------


@query(
    "w4_running_sum",
    oracle="""
    SELECT user_id, event_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_value,
           count(*) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
    FROM events
    """,
)
def w4_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


# --- W5: ntile / percent_rank / cume_dist ----------------------------------


@query(
    "w5_distribution_ranks",
    oracle="""
    SELECT o_orderpriority, o_orderkey,
           ntile(4) OVER w AS quartile,
           round(percent_rank() OVER w + 1e-9, 4) AS pct_rank,
           round(cume_dist() OVER w + 1e-9, 4) AS cume
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def w5_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-priority quartiles/ranks. Partitioned: a global distribution
    rank needs either one task (un-partitioned window) or a two-pass
    histogram — per-group ranks are the form that parallelizes."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w) + 1e-9, 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w) + 1e-9, 4).alias("cume"),
    )


# --- W6: first/last value in frame (keep-last-N retention analog) ----------


@query(
    "w6_first_last_value",
    oracle="""
    SELECT DISTINCT o_custkey AS cust_key,
           first_value(o_orderkey) OVER w AS first_order_key,
           last_value(o_orderkey)  OVER w AS latest_order_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w6_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        o.select(
            F.col("o_custkey").alias("cust_key"),
            F.first("o_orderkey").over(w).alias("first_order_key"),
            F.last("o_orderkey").over(w).alias("latest_order_key"),
        )
        .distinct()
    )


# --- W7: range-based frame ("within the last hour" horizon) ----------------


@query(
    "w7_range_frame",
    oracle="""
    SELECT event_id, user_id,
           round(sum(value) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW), 4) AS hourly_value,
           count(*) OVER (
             PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) AS n_last_hour
    FROM events
    """,
)
def w7_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # Range over epoch microseconds: same µs precision and inclusive bounds
    # as DuckDB's INTERVAL frame (ts cast to long would truncate to seconds
    # and shift frame membership).
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w), 4).alias("hourly_value"),
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
    )


# --- W8: nth_value in frame --------------------------------------------------


@query(
    "w8_nth_value",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           round(nth_value(l_quantity, 2) OVER w + 1e-9, 2) AS second_qty,
           round(nth_value(l_quantity, 3) OVER w + 1e-9, 2) AS third_qty
    FROM lineitem
    WHERE l_orderkey < 2000
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_quantity, l_orderkey, l_linenumber
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
)
def w8_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value over a whole-partition frame — the remaining frame
    navigation function after W6's first/last (e.g. 'second-lowest
    quantity in the flag group' benchmarks every row against a
    near-minimum that ignores the outright minimum).  The ordering key
    is made unique with the (orderkey, linenumber) tie-break so both
    engines pick the same physical row; same single-exchange window
    shape as every W query."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 2000)
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.round(F.nth_value("l_quantity", 2).over(w) + F.lit(1e-9), 2).alias("second_qty"),
        F.round(F.nth_value("l_quantity", 3).over(w) + F.lit(1e-9), 2).alias("third_qty"),
    )


# --- W9: moving median (robust sliding smoother) ----------------------------


@query(
    "w9_moving_median",
    oracle="""
    SELECT user_id, event_id,
           round(CAST(quantile_cont(value, 0.5) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, event_id
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE)
                 + 1e-9, 4) AS med4
    FROM events
    """,
)
def w9_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user moving median over the trailing 4 events — W3's sliding
    mean made outlier-robust (one spiked reading no longer drags the
    smoothed series).  Spark's `percentile` and DuckDB's `quantile_cont`
    share the linear-interpolation definition (the a16 contract), here
    evaluated as a window aggregate; the (ts, event_id) ordering is
    unique so both engines see identical frames.  Same single-exchange
    window shape as every W query."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.expr("percentile(value, 0.5)").over(w) + F.lit(1e-9), 4).alias("med4"),
    )
