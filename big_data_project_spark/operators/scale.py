"""Scale techniques: skew salting and bucketed co-located joins.

These are the 100 TB levers SURVEY §4.2-4.3 calls out beyond what
Catalyst does automatically:

  - **Salted aggregation**: a heavy-hitter group key (think 3 distinct
    `l_returnflag` values across 600 B rows) concentrates each group on
    one reducer. Salting splits every group S ways for the partial
    phase, then re-combines — two small shuffles instead of one skewed
    one. The result is provably identical, so the oracle is the plain
    GROUP BY.
  - **Salted join**: a skewed fact-side join key is joined against a
    dim *replicated S ways*; each fact row picks one deterministic salt
    so every (key, salt) partition is ~1/S the size. Again
    result-identical → plain-join oracle.
  - **Bucketed join**: both sides pre-bucketed (+sorted) on the join
    key at write time; a sort-merge join then needs *zero* shuffle at
    read time — the pattern for repeatedly-joined 100 TB fact tables.
    The zero-exchange property is pinned in tests/test_plans.py.

AQE's skewJoin handles moderate runtime skew on its own (session.py);
explicit salting is for the pathological keys you know in advance.
Reference grounding: the reference hand-shards work into fixed batches
(flax_model.py:235-236) — same idea, balanced units of work.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

N_SALTS = 16


# --- salted two-phase aggregation ------------------------------------------


@query(
    "scale_salted_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(l_extendedprice), 4) AS sum_price,
           round(max(l_discount), 4) AS max_disc
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def scale_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY on a 3-value key via salt → partial → final. sum/count/max
    re-aggregate losslessly (sum of sums, max of maxes); avg would need
    sum+count carried separately."""
    li = load_table(spark, sf_dir, "lineitem")
    salted = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    )
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum("l_extendedprice").alias("psum"),
        F.max("l_discount").alias("pmax"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("psum"), 4).alias("sum_price"),
        F.round(F.max("pmax"), 4).alias("max_disc"),
    )


# --- salted join against a replicated dim ----------------------------------


@query(
    "scale_salted_join",
    oracle="""
    SELECT s.s_nationkey,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def scale_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ supplier with the dim exploded ×16 and the fact side
    salted deterministically. At this dim size broadcast wins (J1) — the
    salted form is for when the "dim" is too big to broadcast AND the
    fact key is skewed."""
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(N_SALTS))
    )
    sup = (
        load_table(spark, sf_dir, "supplier")
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))))
        .withColumn("salt", F.col("salt").cast("long"))
    )
    return (
        li.join(sup, (li.l_suppkey == sup.s_suppkey) & (li.salt == sup.salt))
        .groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        )
    )


# --- bucketed co-located join ----------------------------------------------


def ensure_bucketed(spark: SparkSession, sf_dir: str, n_buckets: int = 8) -> tuple[str, str]:
    """Write orders/lineitem as bucketed+sorted tables (once per sf tier).
    At 100 TB this is the one-time cost that removes the shuffle from
    every subsequent orderkey join."""
    tag = sf_dir.rstrip("/").split("sf")[-1].replace(".", "_")
    names = (f"orders_b{tag}", f"lineitem_b{tag}")
    for tbl, src, key in zip(names, ("orders", "lineitem"), ("o_orderkey", "l_orderkey")):
        if not spark.catalog.tableExists(tbl):
            # the in-memory catalog is per-process but the warehouse dir is
            # not — clear any stale location from a previous session
            import shutil

            wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
            shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
            (
                load_table(spark, sf_dir, src)
                .write.bucketBy(n_buckets, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(tbl)
            )
    return names


def bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw co-located join (pre-aggregation) — plan-contract tests
    assert it contains no shuffle exchange."""
    orders_b, lineitem_b = ensure_bucketed(spark, sf_dir)
    o = spark.table(orders_b).select("o_orderkey", "o_orderpriority")
    li = spark.table(lineitem_b).select("l_orderkey", "l_extendedprice", "l_discount")
    # hint("merge"): force SMJ so the test proves bucketing (not broadcast)
    # removed the exchange; unhinted, AQE may still pick broadcast here.
    return o.hint("merge").join(li, o.o_orderkey == li.l_orderkey)


@query(
    "scale_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def scale_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        bucketed_join(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
        )
    )
