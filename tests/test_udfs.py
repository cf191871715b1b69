"""Differential tests for the Python-boundary surface (X1/X4/X5): the
UDF path must agree with the equivalent pure-JVM expression on the same
data — the engine's internal analog of the DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_x1_pandas_udf_matches_builtin_expression(spark):
    li = load_table(spark, SF, "lineitem")
    jvm = (
        li.groupBy("l_returnflag")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                           * (1 + F.col("l_tax"))), 4).alias("total_charge"))
        .orderBy("l_returnflag")
        .toPandas()
    )
    udf = (
        all_queries()["x1_pandas_udf_charge"](spark, SF)
        .select("l_returnflag", "total_charge")
        .orderBy("l_returnflag")
        .toPandas()
    )
    assert jvm.equals(udf)


def test_x5_weighted_mean_matches_sql_formulation(spark):
    li = load_table(spark, SF, "lineitem")
    sql = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(
                F.sum(F.col("l_quantity") * F.col("l_extendedprice")) / F.sum("l_quantity")
                + 1e-9,
                4,
            ).alias("weighted_avg_price")
        )
        .orderBy("l_returnflag")
        .toPandas()
    )
    udaf = (
        all_queries()["x5_udaf_weighted_stats"](spark, SF)
        .select("l_returnflag", "weighted_avg_price")
        .orderBy("l_returnflag")
        .toPandas()
    )
    assert (sql["weighted_avg_price"] - udaf["weighted_avg_price"]).abs().max() < 1e-3


def test_x4_udtf_matches_builtin_explode(spark):
    udtf_out = all_queries()["x4_udtf_tokenize"](spark, SF).toPandas()
    d = load_table(spark, SF, "documents").filter(F.col("doc_id") < 50)
    builtin = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    ).toPandas()
    key = lambda df: sorted(map(tuple, df[["doc_id", "token", "pos"]].itertuples(index=False)))  # noqa: E731
    assert key(udtf_out) == key(builtin)
