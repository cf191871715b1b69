"""A/B config probe: time a subset of bench rows under extra Spark confs.

Usage: python ab_config.py "k1=v1;k2=v2" name1 name2 ...
       (empty string for baseline)

Mirrors bench.py methodology (one untimed warm-up, min of 2 timed runs,
clearCache between runs, delta-based localCheckpoint sweep) and prints a
jvm calib first so readings can be normalized across probe sessions on
this oscillating host.  One JSON line at the end.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

confs = {}
if len(sys.argv) > 1 and sys.argv[1]:
    for kv in sys.argv[1].split(";"):
        k, v = kv.split("=", 1)
        confs[k] = v
names = sys.argv[2:]

from pyspark.sql import SparkSession

cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
builder = (
    SparkSession.builder.appName("ab-probe")
    .master(f"local[{cpus}]")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.ansi.enabled", "true")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    .config("spark.sql.files.maxPartitionBytes", "134217728")
    .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.sql.warehouse.dir",
            os.environ.get("SPARK_GRAFT_WAREHOUSE", "/tmp/bdp_spark_warehouse"))
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
)
for k, v in confs.items():
    builder = builder.config(k, v)
spark = builder.getOrCreate()
spark.sparkContext.setLogLevel("WARN")

from big_data_project_spark import registry
import bench

qs = dict(registry.all_queries())
qs.update(bench._extra_rows())
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

if not names:
    names = bench.HEADLINE

# warm the JVM + footers
qs[names[0]](spark, sf_dir).limit(1).collect()
if "scale_bucketed_join" in names:
    from big_data_project_spark.operators.scale import ensure_bucketed
    ensure_bucketed(spark, sf_dir)

calib = None
for i in range(3):
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr(
        "sum(cast(id as double) * cast(id as double))").collect()
    dt = time.perf_counter() - t0
    if i > 0:
        calib = dt if calib is None else min(calib, dt)

timings = {}
for name in names:
    before = bench.snapshot_rdd_ids(spark)
    qs[name](spark, sf_dir).count()
    spark.catalog.clearCache()
    best = None
    runs = 3 if name in bench._MIN_OF_3 else 2
    for _ in range(runs):
        t0 = time.perf_counter()
        n = qs[name](spark, sf_dir).count()
        elapsed = time.perf_counter() - t0
        best = elapsed if best is None else min(best, elapsed)
        spark.catalog.clearCache()
    bench.free_new_rdds(spark, before)
    timings[name] = round(best, 3)
    print(f"# {name}: {timings[name]}s", file=sys.stderr)

calib_end = None
for i in range(3):
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr(
        "sum(cast(id as double) * cast(id as double))").collect()
    dt = time.perf_counter() - t0
    if i > 0:
        calib_end = dt if calib_end is None else min(calib_end, dt)

print(json.dumps({
    "confs": confs,
    "queries": timings,
    "total": round(sum(timings.values()), 3),
    "calib_jvm_sec": round(calib, 3),
    "calib_jvm_end_sec": round(calib_end, 3),
}))
spark.stop()
