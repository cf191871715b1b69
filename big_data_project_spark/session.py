"""SparkSession builder tuned for this engine.

Design rules (SURVEY.md §4.3):
  - UTC session timezone so timestamp semantics match the DuckDB oracle.
  - ANSI mode on (Spark 4 default) — overflow/bad-cast errors match DuckDB.
  - AQE on: runtime broadcast-join demotion/promotion, skew-join splitting,
    partition coalescing — the knobs that keep the same plan viable from
    sf0.001 local runs up to a 1000-executor 100 TB cluster.
  - Arrow enabled for every JVM↔Python boundary (pandas UDFs, toPandas).
  - shuffle.partitions sized for local[N] testing; on a real cluster AQE's
    coalescing makes the static number mostly irrelevant (we set a high
    initial partition number and let AQE shrink).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "big_data_project_spark",
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle = str(shuffle_partitions or int(cpus))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- determinism / oracle parity ---
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "true")
        # --- adaptive execution: the scale story ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle)
        # --- Arrow for every Python boundary ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- scan sizing: on 100 TB this is per-task input split size ---
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # INT64-micros timestamps on write (not legacy INT96): INT96 gets
        # no parquet min/max statistics, which silently disables row-group
        # skipping on every timestamp-sorted layout
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # bucketed-table warehouse outside the repo (co-located joins)
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               "/tmp/bdp_spark_warehouse"))
        # quiet the local console
        .config("spark.ui.enabled", "false")
        # local-mode driver == executor: leave generous headroom so a long
        # bench session (450+ stages) never tips into GC-pressure tails
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
