"""Equal-host A/B row timer: bench.py methodology (one warm-up, min-of-N
timed runs over cleared caches, delta RDD free) for a subset of rows.

Usage: AB_REPO=<repo root> python ab_rows.py <row> [<row> ...]
Env: AB_REPO (default /root/repo), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS,
     AB_RUNS (default 3).
Prints one line per row: "AB <repo> <row> <best>s [runs...]".
"""
import os
import sys
import time

REPO = os.environ.get("AB_REPO", "/root/repo")
sys.path.insert(0, REPO)

from big_data_project_spark import registry
from big_data_project_spark.session import get_spark
import bench

spark = get_spark(app_name="ab-rows")
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
n_runs = int(os.environ.get("AB_RUNS", "3"))
qs = dict(registry.all_queries())
qs.update(bench._extra_rows())

# warm the JVM + parquet footers (bench.py's untimed flagship warm-up)
qs["flagship_pricing_summary"](spark, sf_dir).limit(1).collect()

for name in sys.argv[1:]:
    before = bench.snapshot_rdd_ids(spark)
    qs[name](spark, sf_dir).count()  # warm-up: codegen + JIT
    spark.catalog.clearCache()
    runs = []
    for _ in range(n_runs):
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 3))
        spark.catalog.clearCache()
    bench.free_new_rdds(spark, before)
    print(f"AB {REPO} {name} {min(runs)}s {runs}", flush=True)
spark.stop()
