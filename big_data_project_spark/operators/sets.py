"""Set operations (SURVEY.md §2.7, U1-U5).

Reference grounding: shard union ``np.concatenate(list_of_shards, axis=0)``
(``trainer/flax_model.py:118-120``); the train/test split's complement
(``:125-131``) is an EXCEPT; distinct/dedup is the north-star surface
(X6 builds on U5).

Scale notes: ``unionByName`` is a zero-shuffle plan concatenation; INTERSECT
/ EXCEPT compile to hash joins on all columns — at 100 TB prefer key-based
semi/anti joins (J5/J6) over whole-row set ops where a key exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

# --- U1: union all (shard concat, flax_model.py:118-120) -------------------


@query(
    "u1_union_all",
    oracle="""
    SELECT part_kind, count(*) AS n, round(sum(price), 4) AS sum_price
    FROM (
      SELECT 'order' AS part_kind, o_totalprice AS price FROM orders WHERE o_orderstatus = 'F'
      UNION ALL
      SELECT 'line' AS part_kind, l_extendedprice AS price FROM lineitem WHERE l_returnflag = 'R'
    )
    GROUP BY part_kind
    """,
)
def u1_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.lit("order").alias("part_kind"), F.col("o_totalprice").alias("price")
    )
    b = li.filter(F.col("l_returnflag") == "R").select(
        F.lit("line").alias("part_kind"), F.col("l_extendedprice").alias("price")
    )
    return a.unionByName(b).groupBy("part_kind").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("price"), 4).alias("sum_price")
    )


# --- U2: union distinct ----------------------------------------------------


@query(
    "u2_union_distinct",
    oracle="""
    SELECT nation_key FROM (
      SELECT c_nationkey AS nation_key FROM customer
      UNION
      SELECT s_nationkey AS nation_key FROM supplier
    )
    """,
)
def u2_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.select(F.col("c_nationkey").alias("nation_key"))
        .union(s.select(F.col("s_nationkey").alias("nation_key")))
        .distinct()
    )


# --- U3: intersect ---------------------------------------------------------


@query(
    "u3_intersect",
    oracle="""
    SELECT c_nationkey AS nation_key FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
)
def u3_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.col("c_nationkey").alias("nation_key")).intersect(
        s.select(F.col("s_nationkey").alias("nation_key"))
    )


@query(
    "u3_intersect_all",
    oracle="""
    SELECT l_suppkey AS supp_key FROM lineitem WHERE l_quantity > 45
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_discount > 0.08
    """,
)
def u3_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset intersect: each supplier key survives with multiplicity
    min(count in bulk-quantity lines, count in deep-discount lines) —
    bag semantics the DISTINCT form of U3 cannot express."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("supp_key"))
    b = li.filter(F.col("l_discount") > 0.08).select(F.col("l_suppkey").alias("supp_key"))
    return a.intersectAll(b)


# --- U4: except (complement of the O3 split, flax_model.py:125-131) --------


@query(
    "u4_except",
    oracle="""
    SELECT c_custkey AS cust_key FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u4_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-balance customers with no finished order (every fixture nation
    key is referenced everywhere, so predicates make the difference
    nonempty and the check non-vacuous)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_custkey").alias("cust_key"))
        .exceptAll(
            o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("cust_key"))
        )
        .distinct()
    )


@query(
    "u4_except_all",
    oracle="""
    SELECT o_custkey AS cust_key FROM orders
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def u4_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset difference: per customer key, one surviving row per
    NON-finished order (total orders minus finished orders by
    multiplicity) — the bag complement that a DISTINCT except collapses."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(F.col("o_custkey").alias("cust_key")).exceptAll(
        o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("cust_key"))
    )


# --- U5: distinct / dedup-by-columns (north-star dedup foundation) ---------


@query(
    "u5_distinct_rows",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus
    FROM lineitem
    """,
)
def u5_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


@query(
    "u5_dedup_by_key",
    oracle="""
    SELECT user_id,
           min(event_id) AS first_event_id,
           count(*) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def u5_dedup_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates keeps an arbitrary row (§2.7 caveat) — the
    deterministic formulation is min_by/groupBy, used here so the oracle
    hashes stably."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy("user_id").agg(
        F.min("event_id").alias("first_event_id"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "u6_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure, l_quantity AS value
    FROM lineitem WHERE l_linenumber <= 2
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice
    FROM lineitem WHERE l_linenumber <= 2
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'l_discount', l_discount
    FROM lineitem WHERE l_linenumber <= 2
    """,
)
def u6_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshaping via the native ``DataFrame.unpivot`` (SQL
    UNPIVOT/melt — the inverse of a15_pivot).  Catalyst expands it to an
    Expand node: each input row fans out to one row per measure with NO
    shuffle and no join — at 100 TB this is a pure narrow map whose
    output is 3× the (pruned) input columns, and column pruning still
    reaches the scan because the id/value column set is declared
    statically.  The oracle states the same relation as a UNION ALL of
    per-measure projections — semantically identical, but the Spark plan
    scans ONCE where the UNION ALL form would scan three times."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 2)
    return li.unpivot(
        ids=["l_orderkey", "l_linenumber"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="value",
    )
