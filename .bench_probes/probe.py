"""Standalone jvm-calib probe (bench-run-mechanics): min-of-2 after warm-up."""
import time
from pyspark.sql import SparkSession

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.ui.enabled", "false").getOrCreate())
calib = None
for i in range(3):
    t0 = time.perf_counter()
    spark.range(200_000_000).selectExpr(
        "sum(cast(id as double) * cast(id as double))"
    ).collect()
    dt = time.perf_counter() - t0
    if i > 0:
        calib = dt if calib is None else min(calib, dt)
import os
la1, la5, la15 = os.getloadavg()
print(f"PROBE jvm={calib:.3f} load1={la1:.2f} load15={la15:.2f}")
spark.stop()
