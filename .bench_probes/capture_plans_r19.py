"""Capture .explain('formatted') for bench rows into plans/r19/<name>_<tag>.txt.
Usage: python capture_plans_r19.py <tag> [names...]
Env: PLAN_REPO (repo root to import from, default /root/repo),
     PLAN_OUTDIR (default /root/repo/plans/r19).

Plan-only where possible: building each query's DataFrame may run the small
eager jobs some builders contain (threshold collects, localCheckpoints), but
nothing is timed here — this is the plan evidence for OPTIMIZATION_r19.md.
"""
import os
import sys

REPO = os.environ.get("PLAN_REPO", "/root/repo")
sys.path.insert(0, REPO)

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = set(sys.argv[2:])

from big_data_project_spark import registry
from big_data_project_spark.session import get_spark
import bench

spark = get_spark(app_name="plan-capture-r19")
qs = dict(registry.all_queries())
qs.update(bench._extra_rows())

names = [n for n in bench.HEADLINE + bench.DEMONSTRATORS if n in qs]
if ONLY:
    names = [n for n in names if n in ONLY]

outdir = os.environ.get("PLAN_OUTDIR", "/root/repo/plans/r19")
os.makedirs(outdir, exist_ok=True)
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

if "scale_bucketed_join" in names:
    from big_data_project_spark.operators.scale import ensure_bucketed
    ensure_bucketed(spark, sf_dir)

for name in names:
    try:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        with open(f"{outdir}/{name}_{TAG}.txt", "w") as fh:
            fh.write(plan)
        print(f"ok  {name}: {len(plan)} chars")
    except Exception as exc:  # noqa: BLE001
        print(f"ERR {name}: {exc}")
    spark.catalog.clearCache()
spark.stop()
