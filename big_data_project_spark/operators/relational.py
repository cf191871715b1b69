"""Flagship query + projections/filters/predicates (SURVEY.md §2.2, P1-P7).

Reference grounding: the reference's core per-pixel dataflow is
select-channels → validity-filter → impute → clip → cast
(``trainer/flax_model.py:62-94``: npz key select, invalid-temperature mask
``(t < 200) | (t > 330)``, ``np.where(invalid, smoothed, orig)``,
``np.clip(x, 200, 330)``, float32/uint8 casts). Here those semantics are
declared as Catalyst expressions over the driver's tables so predicate
pushdown / column pruning reach the parquet scan — at 100 TB the filter
executes inside the scan, not after it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

# ---------------------------------------------------------------------------
# Flagship: the reference's per-epoch grouped-metrics evaluation pattern
# (trainer/flax_model.py:349-375 — grouped means of loss/accuracy per label
# kind) transposed to the lineitem fact table: scan → filter → project →
# partial/final hash-agg → sort. TPC-H Q1 shape.
# ---------------------------------------------------------------------------


@query(
    "flagship_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 4)                                        AS sum_qty,
           round(sum(l_extendedprice), 4)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
           round(avg(l_quantity), 4)                                        AS avg_qty,
           round(avg(l_extendedprice), 4)                                   AS avg_price,
           round(avg(l_discount), 4)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def flagship_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-12-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(charge), 4).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# P1 — column projection + alias (npz key select / channel select,
# flax_model.py:62-64, 83)
# ---------------------------------------------------------------------------


@query(
    "p1_project_alias",
    oracle="""
    SELECT l_orderkey AS order_key,
           l_linenumber AS line_no,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem
    """,
)
def p1_project_alias(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_no"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net_price"),
    )


# ---------------------------------------------------------------------------
# P2 — range predicate: the invalid-temperature mask (t < 200) | (t > 330)
# (flax_model.py:72, 83-85) generalized to a numeric validity filter.
# ---------------------------------------------------------------------------


@query(
    "p2_range_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem
    WHERE l_quantity < 3 OR l_quantity > 48
    """,
)
def p2_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_quantity") < 3) | (F.col("l_quantity") > 48)).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# ---------------------------------------------------------------------------
# P3 — conditional replace / impute: np.where(invalid, replacement, original)
# (flax_model.py:89-91). Out-of-band account balances imputed to 0.
# ---------------------------------------------------------------------------


@query(
    "p3_conditional_impute",
    oracle="""
    SELECT c_custkey,
           round(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END, 4) AS acctbal_imputed
    FROM customer
    """,
)
def p3_conditional_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.round(
            F.when(F.col("c_acctbal") < 0, F.lit(0.0)).otherwise(F.col("c_acctbal")), 4
        ).alias("acctbal_imputed"),
    )


# ---------------------------------------------------------------------------
# P4 — clip to range: np.clip(x, 200, 330) (flax_model.py:92-94) as
# least(greatest(...)) — stays inside whole-stage codegen.
# ---------------------------------------------------------------------------


@query(
    "p4_clip_range",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(least(greatest(l_quantity, 5.0), 45.0), 4) AS qty_clipped
    FROM lineitem
    """,
)
def p4_clip_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.least(F.greatest(F.col("l_quantity"), F.lit(5.0)), F.lit(45.0)), 4).alias(
            "qty_clipped"
        ),
    )


# ---------------------------------------------------------------------------
# P5 — equality / IN predicate (label routing if label == "lc",
# flax_model.py:245-251)
# ---------------------------------------------------------------------------


@query(
    "p5_in_predicate",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority
    FROM orders
    WHERE o_orderstatus = 'F' AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    """,
)
def p5_in_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority")


# ---------------------------------------------------------------------------
# P6 — null/validity-aware predicate (invalid-mask semantics generalized).
# Fixtures have no NULLs, so we manufacture them with nullif and test
# null-safe handling on both sides.
# ---------------------------------------------------------------------------


@query(
    "p6_null_handling",
    oracle="""
    SELECT c_custkey,
           coalesce(nullif(c_mktsegment, 'MACHINERY'), 'REDACTED') AS segment_masked,
           CASE WHEN nullif(c_mktsegment, 'MACHINERY') IS NULL THEN 1 ELSE 0 END AS was_null
    FROM customer
    """,
)
def p6_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    masked = F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    return c.select(
        "c_custkey",
        F.coalesce(masked, F.lit("REDACTED")).alias("segment_masked"),
        F.when(masked.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("was_null"),
    )


# ---------------------------------------------------------------------------
# P7 — type cast projection (float32/uint8 casts, flax_model.py:242, 246)
# ---------------------------------------------------------------------------


@query(
    "p7_cast_projection",
    oracle="""
    SELECT l_orderkey,
           CAST(l_quantity AS BIGINT)   AS qty_int,
           CAST(l_linenumber AS DOUBLE) AS line_no_f,
           CAST(l_returnflag = 'R' AS INT) AS is_return
    FROM lineitem
    """,
)
def p7_cast_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        F.col("l_quantity").cast("bigint").alias("qty_int"),
        F.col("l_linenumber").cast("double").alias("line_no_f"),
        (F.col("l_returnflag") == "R").cast("int").alias("is_return"),
    )


@query(
    "p8_winsorize",
    oracle="""
    WITH th AS (
      SELECT quantile_cont(l_extendedprice, [0.05, 0.95]) AS q FROM lineitem
    ),
    w AS (
      SELECT l_returnflag,
             l_extendedprice AS raw,
             least(greatest(l_extendedprice, q[1]), q[2]) AS wz,
             CAST(l_extendedprice < q[1] AS INT) AS clip_lo,
             CAST(l_extendedprice > q[2] AS INT) AS clip_hi
      FROM lineitem, th
    )
    SELECT l_returnflag,
           round(avg(raw) + 1e-9, 4) AS avg_raw,
           round(avg(wz) + 1e-9, 4) AS avg_winsorized,
           CAST(sum(clip_lo) AS BIGINT) AS n_clipped_low,
           CAST(sum(clip_hi) AS BIGINT) AS n_clipped_high
    FROM w
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def p8_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorization — the robust cousin of P4's fixed-bound clip: values
    are clamped to the corpus's own [p05, p95], the outlier treatment a
    feature pipeline applies before standardization (the reference clips
    LST to a PHYSICAL range, flax_model.py:79-95; winsorize is the
    data-derived analog).

    Shape at 100 TB: the o8/o13 two-pass trick — ONE exact-percentile
    aggregate collects 2 scalars to the driver, then clipping is a narrow
    map and the report a tiny grouped aggregate.  No window, no join, no
    second full scan beyond the unavoidable two passes (percentiles then
    clip)."""
    li = load_table(spark, sf_dir, "lineitem")
    th = li.agg(
        F.expr("percentile(l_extendedprice, array(0.05, 0.95))").alias("q")
    ).collect()[0]["q"]
    lo, hi = float(th[0]), float(th[1])
    wz = F.least(F.greatest(F.col("l_extendedprice"), F.lit(lo)), F.lit(hi))
    return (
        li.select(
            "l_returnflag",
            F.col("l_extendedprice").alias("raw"),
            wz.alias("wz"),
            (F.col("l_extendedprice") < lo).cast("int").alias("clip_lo"),
            (F.col("l_extendedprice") > hi).cast("int").alias("clip_hi"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.round(F.avg("raw") + F.lit(1e-9), 4).alias("avg_raw"),
            F.round(F.avg("wz") + F.lit(1e-9), 4).alias("avg_winsorized"),
            F.sum("clip_lo").cast("bigint").alias("n_clipped_low"),
            F.sum("clip_hi").cast("bigint").alias("n_clipped_high"),
        )
        .orderBy("l_returnflag")
    )


# --- P9: group-wise z-score normalization -----------------------------------


@query(
    "p9_zscore_normalize",
    oracle="""
    WITH stats AS (
      SELECT l_returnflag,
             avg(l_extendedprice) AS mu,
             stddev_samp(l_extendedprice) AS sigma
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
           round((l.l_extendedprice - s.mu) / s.sigma + 1e-9, 4) AS z
    FROM lineitem l JOIN stats s USING (l_returnflag)
    WHERE l.l_orderkey < 2000
    """,
)
def p9_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score feature transform ((x − μ)/σ, the reference's
    standardization step, flax_model.py:243 — here grouped): group stats
    computed in ONE partial-aggregated pass and broadcast back onto the
    row stream — the two-pass no-window form that scales (a window over
    the whole group would sort every partition; the stats table is
    |groups| rows).  Output restricted to a bounded key range so the
    full rows diff cross-engine."""
    li = load_table(spark, sf_dir, "lineitem")
    stats = li.groupBy("l_returnflag").agg(
        F.avg("l_extendedprice").alias("mu"),
        F.stddev_samp("l_extendedprice").alias("sigma"),
    )
    return (
        li.filter(F.col("l_orderkey") < 2000)
        .join(F.broadcast(stats), "l_returnflag")
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round((F.col("l_extendedprice") - F.col("mu")) / F.col("sigma") + F.lit(1e-9), 4)
            .alias("z"),
        )
    )
