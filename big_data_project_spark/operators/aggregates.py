"""Aggregations (SURVEY.md §2.4, A1-A14).

Reference grounding: the reference's metric loop computes global means of
loss (``trainer/flax_model.py:190, 210``), accuracy as the mean of a boolean
match (``:195``), MSE (``:210``), per-epoch grouped means (``:256-259``),
counts/shapes (``:121-123, 231``), normalization bounds min/max
(``flax_inference.ipynb`` cell 17), and standardization μ/σ (``:243``).
Each generalizes to a declarative Spark aggregate; Spark's partial→final
hash aggregation (map-side combine before the exchange, A12) is exactly the
two-level per-batch → per-epoch mean the reference hand-codes
(``flax_model.py:241-256``) — at 100 TB the partial agg is what keeps the
shuffle small (bytes ∝ #groups, not #rows).

DuckDB parity notes: DuckDB ``sum(INTEGER)`` returns HUGEINT → cast to
BIGINT in oracles; float aggregates rounded to 4dp on both sides (§4.3.1).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

# --- A1: global scalar mean (loss .mean(), flax_model.py:190) --------------


@query(
    "a1_global_mean",
    oracle="""
    SELECT round(avg(l_extendedprice), 4) AS avg_price,
           round(sum(l_extendedprice), 4) AS sum_price
    FROM lineitem
    """,
)
def a1_global_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.sum("l_extendedprice"), 4).alias("sum_price"),
    )


# --- A2: accuracy = mean of boolean (jnp.mean(argmax==argmax),
#     flax_model.py:195) ----------------------------------------------------


@query(
    "a2_boolean_accuracy",
    oracle="""
    SELECT round(avg(CASE WHEN l_returnflag = 'R' THEN 1.0 ELSE 0.0 END), 4) AS return_rate,
           round(avg(CASE WHEN l_discount > 0.05 THEN 1.0 ELSE 0.0 END), 4)  AS high_disc_rate
    FROM lineitem
    """,
)
def a2_boolean_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.avg(F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0)), 4).alias("return_rate"),
        F.round(F.avg(F.when(F.col("l_discount") > 0.05, 1.0).otherwise(0.0)), 4).alias("high_disc_rate"),
    )


# --- A3: MSE / squared error (squared_error(...).mean(), flax_model.py:210) -


@query(
    "a3_mse",
    oracle="""
    SELECT round(CAST(sum(CAST(pow(l_quantity - 25.0, 2) AS BIGINT)) AS DOUBLE) / count(*) + 1e-9, 4) AS mse_qty,
           round(sqrt(CAST(sum(CAST(pow(l_quantity - 25.0, 2) AS BIGINT)) AS DOUBLE) / count(*)) + 1e-9, 4) AS rmse_qty
    FROM lineitem
    """,
)
def a3_mse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l_quantity is integral in the fixtures, so the squared error is summed
    as BIGINT (exactly associative — immune to parallel-sum ordering) and
    divided once. The +1e-9 nudge before round() breaks exact .xxxx5 ties
    the same way in both engines (Spark HALF_UP vs DuckDB multiply+rint
    disagree on ties: 208.44435 → 208.4444 vs 208.4443 at sf0.01)."""
    li = load_table(spark, sf_dir, "lineitem")
    se_int = F.pow(F.col("l_quantity") - 25.0, 2).cast("bigint")
    mse = F.sum(se_int).cast("double") / F.count(F.lit(1))
    return li.agg(
        F.round(mse + 1e-9, 4).alias("mse_qty"),
        F.round(F.sqrt(mse) + 1e-9, 4).alias("rmse_qty"),
    )


# --- A4: grouped hash agg (per-epoch metric grouping, flax_model.py:349-375)


@query(
    "a4_grouped_metrics",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                       AS n_orders,
           round(sum(o_totalprice), 4)    AS sum_total,
           round(avg(o_totalprice), 4)    AS avg_total,
           round(min(o_totalprice), 4)    AS min_total,
           round(max(o_totalprice), 4)    AS max_total
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    """,
)
def a4_grouped_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 4).alias("sum_total"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_total"),
        F.round(F.min("o_totalprice"), 4).alias("min_total"),
        F.round(F.max("o_totalprice"), 4).alias("max_total"),
    )


# --- A5: count(*) vs count(col) with NULLs ---------------------------------


@query(
    "a5_counts",
    oracle="""
    SELECT count(*) AS n_rows,
           count(nullif(c_mktsegment, 'MACHINERY')) AS n_non_machinery,
           CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_positive
    FROM customer
    """,
)
def a5_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))).alias("n_non_machinery"),
        F.sum(F.when(F.col("c_acctbal") > 0, 1).otherwise(0)).cast("bigint").alias("n_positive"),
    )


# --- A6: min/max normalization bounds (flax_inference.ipynb cell 17) -------


@query(
    "a6_minmax_bounds",
    oracle="""
    SELECT l_returnflag,
           round(min(l_extendedprice), 4) AS min_price,
           round(max(l_extendedprice), 4) AS max_price,
           round(max(l_extendedprice) - min(l_extendedprice), 4) AS price_range
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a6_minmax_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.min("l_extendedprice"), 4).alias("min_price"),
        F.round(F.max("l_extendedprice"), 4).alias("max_price"),
        F.round(F.max("l_extendedprice") - F.min("l_extendedprice"), 4).alias("price_range"),
    )


# --- A7: exact distinct count ----------------------------------------------


@query(
    "a7_distinct_count",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           count(DISTINCT user_id) AS n_users,
           count(*) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def a7_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.date_trunc("day", "ts").alias("day")).agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- A8: approximate distinct (HLL) — sketches are engine-specific →
#     rows-only check; a pytest invariant bounds the error vs exact. --------


@query("a8_approx_distinct", oracle=None)
def a8_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB path for A7: HyperLogLog sketch, no exact-distinct shuffle of
    the full key set. rsd=0.01 keeps the sketch small enough to merge
    map-side."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )


# --- A9: stddev / variance (standardize μ,σ, flax_model.py:243) ------------


@query(
    "a9_stddev_variance",
    oracle="""
    SELECT l_linestatus,
           round(stddev_samp(l_quantity), 4) AS sd_qty,
           round(var_samp(l_quantity), 4)    AS var_qty,
           round(stddev_pop(l_quantity), 4)  AS sd_pop_qty,
           round(avg(l_quantity), 4)         AS mean_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def a9_stddev_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 4).alias("var_qty"),
        F.round(F.stddev_pop("l_quantity"), 4).alias("sd_pop_qty"),
        F.round(F.avg("l_quantity"), 4).alias("mean_qty"),
    )


# --- A10: rollup / cube / grouping sets ------------------------------------


@query(
    "a10_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def a10_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


@query(
    "a10_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n,
           round(avg(o_totalprice), 4) AS avg_total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def a10_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_total"),
    )


@query(
    "a10_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_rf,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_ls,
           count(*) AS n,
           round(sum(l_quantity), 4) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def a10_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — two non-hierarchical groupings in one scan
    (neither is a prefix of the other, so neither rollup nor cube covers
    this shape without waste). GROUPING() flags disambiguate a NULL that
    came from the data from a NULL that marks the aggregated-away column —
    load-bearing once the grouped columns are nullable."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(
        F.grouping("l_returnflag").cast("int").alias("g_rf"),
        F.grouping("l_linestatus").cast("int").alias("g_ls"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
    )


# --- A11: filtered / conditional agg (accuracy only for label=="lc",
#     flax_model.py:254-259) ------------------------------------------------


@query(
    "a11_filtered_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_extendedprice) FILTER (WHERE l_discount > 0.05), 4) AS sum_discounted,
           count(*) FILTER (WHERE l_quantity > 25) AS n_bulk,
           round(avg(l_extendedprice) FILTER (WHERE l_linestatus = 'F'), 4) AS avg_finished
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a11_filtered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_extendedprice"))), 4).alias("sum_discounted"),
        F.count(F.when(F.col("l_quantity") > 25, F.lit(1))).alias("n_bulk"),
        F.round(F.avg(F.when(F.col("l_linestatus") == "F", F.col("l_extendedprice"))), 4).alias("avg_finished"),
    )


# --- A13: collect_list / collect_set (epoch_loss.append accumulation,
#     flax_model.py:238-255) — sorted for order stability (§4.3.3) ----------


@query(
    "a13_collect_list",
    oracle="""
    SELECT n_regionkey AS region_key,
           array_to_string(list(n_name ORDER BY n_name), ',') AS nations,
           count(*) AS n
    FROM nation
    GROUP BY n_regionkey
    """,
)
def a13_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emitted as a sorted comma-joined STRING, not a raw array: the driver's
    pandas canonicalizer cannot hash list cells (round-1 red row), and the
    sort makes the value order-stable regardless of partitioning."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy(F.col("n_regionkey").alias("region_key")).agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )


# --- A14: histogram / per-class value counts (9-class label distribution,
#     flax_model.py:184) ----------------------------------------------------


@query(
    "a14_histogram",
    oracle="""
    SELECT label AS class_id, count(*) AS n
    FROM embeddings
    GROUP BY label
    """,
)
def a14_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    return em.groupBy(F.col("label").alias("class_id")).agg(F.count(F.lit(1)).alias("n"))


# --- A15: pivot (wide-format grouped agg) -----------------------------------


@query(
    "a15_pivot",
    oracle="""
    SELECT l_returnflag,
           round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 4) AS qty_F,
           round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 4) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a15_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with an explicit value list — explicit values keep
    the output schema static (schema inference for pivot is an extra
    distinct-scan, and nondeterministic column order, at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.round(F.sum("l_quantity"), 4))
    )
    return wide.select(
        "l_returnflag",
        F.col("F").alias("qty_F"),
        F.col("O").alias("qty_O"),
    )


# --- A17: correlation / covariance ------------------------------------------


@query(
    "a17_corr_covar",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4) AS qty_price_corr,
           round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a17_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + sample covariance (both engines use sample
    semantics; single-pass co-moment accumulators, map-side combinable)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("qty_price_corr"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4).alias("qty_price_covar"),
    )


# --- A16: exact percentiles (continuous interpolation) ----------------------


@query(
    "a16_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a16_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact `percentile` (linear interpolation — same definition as
    DuckDB's quantile_cont). At 100 TB prefer `approx_percentile`
    (t-digest sketch, map-side combinable); the exact form shown here
    needs a full sort per group."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.25)"), 4).alias("p25"),
        F.round(F.expr("percentile(l_extendedprice, 0.50)"), 4).alias("p50"),
        F.round(F.expr("percentile(l_extendedprice, 0.75)"), 4).alias("p75"),
    )


# --- A19: approx percentiles (the 100 TB path for A16) -----------------------


@query("a19_approx_percentiles", oracle=None)
def a19_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile: KLL-style mergeable quantile sketch — map-side
    combinable, so a 100 TB per-group quantile costs one narrow pass +
    a sketch merge instead of the full per-group sort the exact form
    (a16) needs. accuracy=10000 bounds rank error at 1/10000·n.
    Sketches are engine-specific → rows-only; the error bound vs the
    exact percentiles is asserted in tests/test_pipeline.py."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("approx_percentile(l_extendedprice, 0.25, 10000)").alias("p25"),
        F.expr("approx_percentile(l_extendedprice, 0.50, 10000)").alias("p50"),
        F.expr("approx_percentile(l_extendedprice, 0.75, 10000)").alias("p75"),
    )


# --- A18: column profiling (data-quality summary) ----------------------------


@query(
    "a18_profile_columns",
    oracle="""
    WITH base AS (SELECT l_quantity, l_discount FROM lineitem)
    SELECT 'l_quantity' AS col_name,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(l_quantity) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT l_quantity) AS BIGINT) AS n_distinct,
           round(min(l_quantity), 4) AS min_val,
           round(max(l_quantity), 4) AS max_val
    FROM base
    UNION ALL
    SELECT 'l_discount',
           CAST(count(*) AS BIGINT),
           CAST(count(l_discount) AS BIGINT),
           CAST(count(DISTINCT l_discount) AS BIGINT),
           round(min(l_discount), 4),
           round(max(l_discount), 4)
    FROM base
    """,
)
def a18_profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the null-rate / distinct / range summary every
    ingestion pipeline runs first). One scan computes every column's
    stats side by side; the per-column rows come from a stack/unpivot of
    that single aggregate row — NOT one scan per column."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.count("l_quantity").alias("nn_q"),
        F.countDistinct("l_quantity").alias("nd_q"),
        F.round(F.min("l_quantity"), 4).alias("mn_q"),
        F.round(F.max("l_quantity"), 4).alias("mx_q"),
        F.count("l_discount").alias("nn_d"),
        F.countDistinct("l_discount").alias("nd_d"),
        F.round(F.min("l_discount"), 4).alias("mn_d"),
        F.round(F.max("l_discount"), 4).alias("mx_d"),
    )
    return agg.select(
        F.expr(
            "stack(2,"
            " 'l_quantity', n, nn_q, nd_q, mn_q, mx_q,"
            " 'l_discount', n, nn_d, nd_d, mn_d, mx_d"
            ") AS (col_name, n, n_nonnull, n_distinct, min_val, max_val)"
        )
    )


# --- A20: count-min sketch heavy hitters (the 100 TB path for exact token
#     counting when the key space itself is too big to hold) ----------------

_CMS_W = 64  # buckets per hash row
_CMS_D = 4   # independent hash rows


def _cms_bucket(r: int, token_col):
    """Cross-engine count-min hash: md5 of 'r:token', 15-hex-char prefix
    as a 60-bit int, mod W.  Deterministic and identical in Spark
    (conv base-16) and DuckDB (CAST '0x…' AS BIGINT), unlike xxhash64."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(r)), token_col)), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(_CMS_W))


@query(
    "a20_countmin_topk",
    oracle=f"""
    WITH tok AS (
      SELECT unnest(string_split(text, ' ')) AS token FROM documents
    ), rs AS (
      SELECT unnest(generate_series(0, {_CMS_D - 1})) AS r
    ), cells AS (
      SELECT r, CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token),
                                     1, 15)) AS BIGINT) % {_CMS_W} AS bucket
      FROM tok CROSS JOIN rs
    ), cms AS (
      SELECT r, bucket, CAST(count(*) AS BIGINT) AS cell_n
      FROM cells GROUP BY r, bucket
    ), exact AS (
      SELECT token, CAST(count(*) AS BIGINT) AS exact_n FROM tok GROUP BY token
    ), probes AS (
      SELECT token, exact_n, r,
             CAST(('0x' || substr(md5(CAST(r AS VARCHAR) || ':' || token),
                                  1, 15)) AS BIGINT) % {_CMS_W} AS bucket
      FROM exact CROSS JOIN rs
    )
    SELECT token, exact_n, min(cell_n) AS cms_estimate
    FROM probes JOIN cms USING (r, bucket)
    GROUP BY token, exact_n
    ORDER BY exact_n DESC, token
    LIMIT 20
    """,
)
def a20_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch built entirely from DataFrame primitives: each
    token updates one bucket in each of d=4 hash rows (md5 salted by row
    id — cross-engine-reproducible, so the ENTIRE sketch is mirrored and
    hash-verified in the DuckDB oracle); the sketch is the (row, bucket)
    count table — d·w = 256 cells regardless of corpus size, built in
    ONE narrow pass with map-side partial aggregation. A key's estimate
    is the MIN of its d cells: always ≥ the true count (collisions only
    add), within εN with high probability. At 100 TB the sketch replaces
    a full shuffle on a billion-key token space with a 256-row
    broadcast; estimates here are joined against the exact counts so the
    error is visible (and pinned in tests/test_pipeline.py)."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(F.explode(F.split("text", " ")).alias("token"))
    cells = tok.select(
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("r"), _cms_bucket(r, F.col("token")).alias("bucket"))
                for r in range(_CMS_D)
            ])
        ).alias("c")
    ).select("c.r", "c.bucket")
    cms = cells.groupBy("r", "bucket").agg(F.count(F.lit(1)).alias("cell_n"))
    exact = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.select(
        "token",
        "exact_n",
        F.explode(
            F.array(*[
                F.struct(F.lit(r).alias("r"), _cms_bucket(r, F.col("token")).alias("bucket"))
                for r in range(_CMS_D)
            ])
        ).alias("p"),
    ).select("token", "exact_n", "p.r", "p.bucket")
    return (
        probes.join(F.broadcast(cms), ["r", "bucket"])
        .groupBy("token", "exact_n")
        .agg(F.min("cell_n").alias("cms_estimate"))
        .orderBy(F.col("exact_n").desc(), "token")
        .limit(20)
    )


# --- A21: mergeable HLL sketches (partial sketches → union → estimate) ------


@query("a21_hll_merge", oracle=None)
def a21_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches, the 100 TB aggregation pattern
    made explicit: per-source HLL sketches (datasketches hll_sketch_agg)
    are materialized as binary columns, then hll_union_agg merges them
    into the corpus-wide estimate — the same two-level motion a map-side
    partial + final aggregate performs, but with a REUSABLE intermediate:
    per-partition sketches can be stored in a metrics table and re-merged
    along any dimension without rescanning the corpus (a13's exact
    distinct cannot compose that way). Output: per-source estimates plus
    the merged ALL row; estimates are sketch-implementation-specific →
    rows-only, with the union-vs-exact error bound asserted in
    tests/test_pipeline.py."""
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("source", F.explode(F.split("text", " ")).alias("token"))
    per_source = tok.groupBy("source").agg(
        F.expr("hll_sketch_agg(token, 12)").alias("sketch")
    )
    est = per_source.select(
        "source",
        F.expr("hll_sketch_estimate(sketch)").cast("bigint").alias("distinct_est"),
    )
    merged = per_source.agg(
        F.expr("hll_sketch_estimate(hll_union_agg(sketch, true))")
        .cast("bigint")
        .alias("distinct_est")
    ).select(F.lit("ALL").alias("source"), "distinct_est")
    return est.unionByName(merged)


# --- A22: exact distinct via mergeable bitmaps ------------------------------


@query(
    "a22_bitmap_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_distinct_suppliers
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a22_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through mergeable bitmaps
    (bitmap_bucket_number / bitmap_construct_agg / bitmap_count): each
    32k-wide bucket aggregates to a fixed-size bitmap, bucket counts sum
    to the exact distinct. Between HLL (a8/a21: approximate, tiny) and
    count(DISTINCT) (a7: exact, but the dedup shuffle carries every
    value), bitmaps are exact AND mergeable — per-partition bitmaps OR
    together, so at 100 TB the shuffle carries one bitmap per (group,
    bucket) instead of one row per distinct value. Dense integer keys are
    the sweet spot (suppkey here); the oracle checks the count is exactly
    count(DISTINCT)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_bucket = (
        li.groupBy("l_returnflag", F.expr("bitmap_bucket_number(l_suppkey)").alias("bkt"))
        .agg(F.expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(l_suppkey)))").alias("cnt"))
    )
    return per_bucket.groupBy("l_returnflag").agg(
        F.sum("cnt").cast("bigint").alias("n_distinct_suppliers")
    )


@query(
    "a23_mode_per_group",
    oracle="""
    WITH c AS (
      SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    ),
    r AS (
      SELECT l_returnflag, l_linestatus, n,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY n DESC, l_linestatus) AS rk
      FROM c
    )
    SELECT l_returnflag, l_linestatus AS mode_status, n AS mode_count
    FROM r WHERE rk = 1
    ORDER BY l_returnflag
    """,
)
def a23_mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group mode with a DETERMINISTIC tie-break (highest count,
    then smallest value) — built from count + row_number rather than the
    native ``mode()`` aggregate, whose tie choice is engine-defined and
    would never hash-match across engines.  Two-level aggregation: the
    count groupBy is partial+final (map-side combine collapses the
    bounded (flag,status) key space before the exchange), and the
    row_number window runs over the already-tiny count table — at 100 TB
    the only full-data exchange is the first groupBy's combined
    partials."""
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy("l_returnflag", "l_linestatus").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("l_returnflag").orderBy(F.col("n").desc(), "l_linestatus")
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "l_returnflag",
            F.col("l_linestatus").alias("mode_status"),
            F.col("n").alias("mode_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "a24_string_agg",
    oracle="""
    SELECT o_orderpriority,
           string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def a24_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg: concatenate a group's values into one ordered
    string.  Built as collect_set → array_sort → array_join so the result
    is deterministic regardless of partitioning (raw collect_list order
    is partition-arrival order, which would never hash-match).  The
    collect_set partial-aggregates map-side; with a bounded value domain
    (order statuses) the exchanged state is tiny even at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("o_orderpriority")
    )


# --- A25: linear-regression aggregates ---------------------------------------


@query(
    "a25_regression",
    oracle="""
    SELECT l_returnflag,
           round(regr_slope(l_extendedprice, l_quantity) + 1e-9, 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity) + 1e-9, 4) AS intercept,
           round(regr_r2(l_extendedprice, l_quantity) + 1e-9, 6) AS r2,
           CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def a25_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-least-squares aggregate family (slope / intercept / R² /
    count) per return flag — completes the bivariate statistics surface
    beyond a17's corr/covar.  Like all moment-based aggregates the
    state is a handful of associative sums, so the map-side combine
    holds at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = "l_quantity", "l_extendedprice"
    return li.groupBy("l_returnflag").agg(
        F.round(F.regr_slope(y, x) + F.lit(1e-9), 4).alias("slope"),
        F.round(F.regr_intercept(y, x) + F.lit(1e-9), 4).alias("intercept"),
        F.round(F.regr_r2(y, x) + F.lit(1e-9), 6).alias("r2"),
        F.regr_count(y, x).cast("bigint").alias("n"),
    )


# --- Benford first-digit audit (prepped for a future window) -----------------

# log10(1 + 1/d) for d = 1..9, precomputed ONCE in Python and embedded as
# the same literals in both engines — no query-time transcendental, so no
# cross-engine ulp surface (the b7 pow() lesson applied to log10).
_BENFORD_PCT = {d: round(math.log10(1 + 1 / d), 4) for d in range(1, 10)}


def benford_digit_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit census of lineitem extended prices against
    Benford's law: one row per digit 1-9 with observed count, observed
    share, the Benford expectation, and the absolute deviation — the
    classic wholesale data-quality / fabrication screen (organically
    generated positive amounts spanning magnitudes follow
    log10(1 + 1/d); synthetic, capped, or tampered columns do not), run
    as a data-audit gate before a table feeds training.  TPC-H prices
    are uniform-ish within a band, so the fixture legitimately DEVIATES
    — the audit's point is measuring the deviation, and the test pins
    that it is material.  Reference analog: the scored-entity corpus
    analytics shape, big_data_project/trainer/flax_model.py.

    Registered r10 as `x82_benford_audit` (with `_BENFORD_ORACLE`)
    once the window opened.

    Parity: the first digit comes from the DECIMAL's floor cast to a
    string prefix — explicit floor() on both engines because DuckDB
    ROUNDS on integer casts while Spark truncates (a 949.80 price would
    otherwise read digit 9 on one engine and 1 on the other at the
    950→1000 boundary... the floor removes the class); shares are exact
    integer divisions rounded to 4.

    Scale design: one narrow digit map over the scan (prices ≥ 1 by
    TPC-H construction, so the digit is always 1-9), one 9-group
    partial-aggregated exchange, a 1-row total broadcast back, and a
    9-row literal Benford table broadcast-joined — nothing wider than
    (int, long) crosses the wire."""
    li = load_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    digit = F.substring(
        F.floor(F.col("l_extendedprice")).cast("bigint").cast("string"), 1, 1
    ).cast("int")
    counts = li.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    total = counts.agg(F.sum("n").alias("t"))
    bf = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_PCT.items()], schema="digit int, benford_pct double"
    )
    obs = F.col("n") / F.col("t")
    return (
        counts.crossJoin(F.broadcast(total))
        .join(F.broadcast(bf), "digit")
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(obs + F.lit(1e-9), 4).alias("obs_pct"),
            "benford_pct",
            F.round(F.abs(obs - F.col("benford_pct")) + F.lit(1e-9), 4).alias(
                "abs_dev"
            ),
        )
        .orderBy("digit")
    )


_BENFORD_ORACLE = f"""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(l_extendedprice) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INT) AS digit
      FROM lineitem),
    counts AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    bf(digit, benford_pct) AS (VALUES
      {", ".join(f"({d}, {p})" for d, p in _BENFORD_PCT.items())})
    SELECT c.digit, c.n,
           round(c.n * 1.0 / (SELECT sum(n) FROM counts) + 1e-9, 4) AS obs_pct,
           b.benford_pct,
           round(abs(c.n * 1.0 / (SELECT sum(n) FROM counts) - b.benford_pct)
                 + 1e-9, 4) AS abs_dev
    FROM counts c JOIN bf b ON b.digit = c.digit
    ORDER BY c.digit
"""

query("x82_benford_audit", oracle=_BENFORD_ORACLE)(benford_digit_audit)
