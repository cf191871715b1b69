"""Stage-level profile of one bench row via the Spark UI REST API.

Usage: python profile_query.py <query_name> [sf_dir]

Runs the query once warm (bench methodology: one warm-up, then a timed
run), then dumps per-stage wall/task metrics sorted by executor run time,
so the wall can be attributed to scan / exchange / broadcast / driver gaps.
Not a timing anchor — a shape probe.
"""
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")

name = sys.argv[1]
sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from big_data_project_spark import registry
from big_data_project_spark.session import get_spark
import bench

# UI on for this probe only
from pyspark.sql import SparkSession
cpus = os.environ["SPARK_GRAFT_CPUS"]
spark = (
    SparkSession.builder.appName("profile-probe")
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
    .config("spark.sql.warehouse.dir", "/tmp/bdp_spark_warehouse")
    .config("spark.ui.enabled", "true")
    .config("spark.ui.port", "4050")
    .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

qs = dict(registry.all_queries())
qs.update(bench._extra_rows())
if name == "scale_bucketed_join":
    from big_data_project_spark.operators.scale import ensure_bucketed
    ensure_bucketed(spark, sf_dir)

before = bench.snapshot_rdd_ids(spark)
qs[name](spark, sf_dir).count()          # warm-up
spark.catalog.clearCache()

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4050/api/v1/applications/{app_id}"
jobs0 = json.load(urllib.request.urlopen(f"{base}/jobs"))
first_job = max((j["jobId"] for j in jobs0), default=-1) + 1

t0 = time.perf_counter()
n = qs[name](spark, sf_dir).count()
wall = time.perf_counter() - t0
spark.catalog.clearCache()
bench.free_new_rdds(spark, before)

jobs = [j for j in json.load(urllib.request.urlopen(f"{base}/jobs")) if j["jobId"] >= first_job]
stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
stages = json.load(urllib.request.urlopen(f"{base}/stages"))
rows = []
for s in stages:
    if s["stageId"] not in stage_ids or s["status"] == "SKIPPED":
        continue
    sub = time.mktime(time.strptime(s["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")) if "submissionTime" in s and s.get("submissionTime") else 0
    rows.append({
        "id": s["stageId"],
        "tasks": s["numCompleteTasks"],
        "runtime_ms": s["executorRunTime"],
        "cpu_ms": s.get("executorCpuTime", 0) // 1_000_000,
        "in_MB": round(s["inputBytes"] / 1e6, 1),
        "sh_r_MB": round(s["shuffleReadBytes"] / 1e6, 2),
        "sh_w_MB": round(s["shuffleWriteBytes"] / 1e6, 2),
        "name": s["name"][:70],
    })
rows.sort(key=lambda r: -r["runtime_ms"])
print(f"== {name}: wall={wall:.3f}s rows={n} jobs={len(jobs)} stages={len(rows)}")
tot_rt = sum(r["runtime_ms"] for r in rows)
print(f"   sum(executorRunTime)={tot_rt}ms  (wall*32cores={wall*32000:.0f}ms)")
for r in rows[:25]:
    print(f"   st{r['id']:>4} tasks={r['tasks']:>3} run={r['runtime_ms']:>6}ms cpu={r['cpu_ms']:>6}ms in={r['in_MB']:>7} shR={r['sh_r_MB']:>8} shW={r['sh_w_MB']:>8}  {r['name']}")
spark.stop()
