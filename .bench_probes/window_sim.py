"""Simulate the grading driver: run the first-50 ordered window queries
through __spark_entry__ in a PLAIN session at sf0.01 with DuckDB compare."""
import hashlib
import importlib.util
import json
import time

import duckdb

spec = importlib.util.spec_from_file_location("__spark_entry__", "/root/repo/__spark_entry__.py")
mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)
from pyspark.sql import SparkSession

from big_data_project_spark import registry

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.ui.enabled", "false").getOrCreate())
sf = "/root/testdata/sf0.01"
qs, osql = mod.queries(), mod.oracle_sql()
window = registry._ordered(list(qs))[:50]

def h(cols, rows):
    o = sorted(range(len(cols)), key=lambda i: list(cols)[i])
    return hashlib.md5("\n".join(sorted(repr(tuple(r[i] for i in o)) for r in rows)).encode()).hexdigest()

results = {}
for name in window:
    t0 = time.time()
    try:
        df = qs[name](spark, sf)
        srows = [tuple(r) for r in df.collect()]
        if name in osql:
            con = duckdb.connect()
            for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
            res = con.execute(osql[name]); oc = [d[0] for d in res.description]; orr = res.fetchall()
            ok = (len(srows) == len(orr) and sorted(df.columns) == sorted(oc)
                  and h(df.columns, srows) == h(oc, orr))
            results[name] = "PASS" if ok else "FAIL"
            con.close()
        else:
            results[name] = "ROWS" if len(srows) > 0 else "EMPTY"
    except Exception as e:
        results[name] = f"ERR {type(e).__name__}: {e}"[:120]
    print(f"{name}: {results[name]} ({time.time()-t0:.1f}s)", flush=True)

bad = {k: v for k, v in results.items() if v not in ("PASS", "ROWS")}
print(json.dumps({"n": len(results), "bad": bad}))
spark.stop()
