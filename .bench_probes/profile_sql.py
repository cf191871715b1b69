"""Per-operator profile of one bench row via the UI /sql REST endpoint.

Usage: python profile_sql.py <query_name> [sf_dir]
Prints the slowest SQL-plan nodes of the timed execution with their
key metrics — the operator-level attribution the stage view can't give.
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
import bench
from pyspark.sql import SparkSession

cpus = os.environ["SPARK_GRAFT_CPUS"]
spark = (
    SparkSession.builder.appName("profile-sql")
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
    .config("spark.driver.memory", "16g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("WARN")

qs = dict(registry.all_queries())
qs.update(bench._extra_rows())
if name == "scale_bucketed_join":
    from big_data_project_spark.operators.scale import ensure_bucketed
    ensure_bucketed(spark, sf_dir)

before = bench.snapshot_rdd_ids(spark)
qs[name](spark, sf_dir).count()
spark.catalog.clearCache()

app_id = spark.sparkContext.applicationId
base = f"http://localhost:4050/api/v1/applications/{app_id}"
execs0 = json.load(urllib.request.urlopen(f"{base}/sql?length=1000"))
first = max((e["id"] for e in execs0), default=-1) + 1

t0 = time.perf_counter()
n = qs[name](spark, sf_dir).count()
wall = time.perf_counter() - t0
spark.catalog.clearCache()
bench.free_new_rdds(spark, before)

execs = [e for e in json.load(urllib.request.urlopen(
    f"{base}/sql?length=1000&details=true&planDescription=false"))
    if e["id"] >= first]
print(f"== {name}: wall={wall:.3f}s rows={n} sql_executions={len(execs)}")


def ms(v):
    v = v.strip()
    # formats like "1.2 s", "345 ms", "total (min, med, max (stageId: taskId))\n1.2 s (...)"
    line = v.splitlines()[-1] if "\n" in v else v
    tok = line.split("(")[0].strip()
    try:
        if tok.endswith("ms"):
            return float(tok[:-2].strip())
        if tok.endswith("s"):
            return float(tok[:-1].strip()) * 1000
        if tok.endswith("m"):
            return float(tok[:-1].strip()) * 60000
    except ValueError:
        return 0.0
    return 0.0


nodes = []
for e in execs:
    dur = e.get("duration", 0)
    for nd in e.get("nodes", []):
        tot = 0.0
        keep = {}
        for m in nd.get("metrics", []):
            nm = m["name"]
            if nm in ("time in aggregation build", "sort time", "time to build hash map",
                      "time to broadcast", "time to collect", "scan time",
                      "shuffle write time", "fetch wait time", "task commit time",
                      "time in aggregation", "duration"):
                t = ms(m["value"])
                tot = max(tot, t)
                if t > 50:
                    keep[nm] = m["value"].splitlines()[-1][:50]
        if tot > 50:
            nodes.append((tot, e["id"], nd["nodeName"][:45], keep))
nodes.sort(reverse=True)
print(f"   (exec ids {first}..; durations: " + ", ".join(
    f"#{e['id']}={e.get('duration',0)}ms" for e in execs) + ")")
for tot, eid, nm, keep in nodes[:30]:
    print(f"   {tot:>8.0f}ms  exec#{eid}  {nm}  {keep}")
spark.stop()
