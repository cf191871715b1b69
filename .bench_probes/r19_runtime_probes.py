"""Runtime plan evidence for the r19 changes that static explain cannot show.

1. x88: each NN-descent round's candidate set now pays ONE exchange
   (repartition on the window key; the dedup aggregate rides that layout)
   instead of TWO (distinct on (a,b) + spread on a).  The round frames are
   eagerly checkpointed, so the census's static plan hides them — compare
   the EXECUTED per-round topk plan of the old and new shapes directly.
2. x64: the oriented-edge cache is persisted hash(src)-partitioned, so at
   runtime (after the cache materializes, AQE replanning) BOTH wedge legs
   read the InMemoryTableScan with no Exchange.  The static explain prints
   the conservative pre-materialization shape — dump the final executed
   plan's wedge-join region instead.

Writes plans/r19/x88_round_exchange_probe.txt and
plans/r19/x64_runtime_wedge_probe.txt.
"""
import os
import re
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")

from pyspark.sql import functions as F

from big_data_project_spark import registry
from big_data_project_spark.io import load_table
from big_data_project_spark.pipeline.similarity import (
    _nnd_expand, _nnd_topk, _unit_normalize,
)
from big_data_project_spark.session import get_spark

registry.load()
spark = get_spark(app_name="r19-runtime-probes")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/root/repo/plans/r19"
os.makedirs(OUT, exist_ok=True)

# ---- probe 1: x88 per-round candidate exchanges -------------------------
e = _unit_normalize(
    load_table(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
).persist()
cur = (
    _nnd_topk(
        e.select(F.col("vec_id").alias("a"))
        .join(e.select(F.col("vec_id").alias("b")), F.col("a") != F.col("b"))
        .limit(2000)
        .select("a", "b"),
        e,
    )
    .localCheckpoint()
)
new = _nnd_topk(_nnd_expand(cur), e, dedup=True)
old = _nnd_topk(_nnd_expand(cur).distinct(), e)  # the pre-r19 shape
lines = ["x88 per-round candidate-set shuffle probe (executedPlan, pre-AQE)",
         "old = _nnd_topk(_nnd_expand(cur).distinct())  [r18 shape]",
         "new = _nnd_topk(_nnd_expand(cur), dedup=True) [r19 shape]", ""]
for tag, df in (("old", old), ("new", new)):
    p = df._jdf.queryExecution().executedPlan().toString()
    n_hash = p.count("Exchange hashpartitioning")
    lines.append(f"== {tag}: Exchange hashpartitioning nodes = {n_hash}")
    for l in p.splitlines():
        if re.search(r"Exchange hash|HashAggregate|WindowGroupLimit|Window \[", l):
            lines.append("  " + l.strip()[:150])
    lines.append("")
with open(f"{OUT}/x88_round_exchange_probe.txt", "w") as fh:
    fh.write("\n".join(lines))
print("wrote x88_round_exchange_probe.txt")
spark.catalog.clearCache()

# ---- probe 2: x64 runtime wedge-join region ----------------------------
df = registry.QUERIES["x64_triangle_count"](spark, SF)
df.count()
txt = df._jdf.queryExecution().executedPlan().toString()
out = ["x64 final executed plan, wedge-join region (AQE, cache materialized).",
       "Both wedge legs (e1 streamed, e2 build) read the hash(src)-partitioned",
       "InMemoryTableScan with NO Exchange; the closure probe (e3) and the",
       "wedge stream pay the remaining two exchanges.", ""]
keep = re.compile(
    r"ShuffledHashJoin|Exchange hashpartitioning|InMemoryTableScan \[src|"
    r"Filter \(isnotnull\(src|TakeOrderedAndProject|HashAggregate\(keys=\[node"
)
for i, l in enumerate(txt.splitlines()):
    if keep.search(l) and "== Initial" not in l:
        out.append(f"L{i:>5} " + l.strip()[:160])
    if i > 2000:
        break
with open(f"{OUT}/x64_runtime_wedge_probe.txt", "w") as fh:
    fh.write("\n".join(out))
print("wrote x64_runtime_wedge_probe.txt")
spark.catalog.clearCache()
spark.stop()
