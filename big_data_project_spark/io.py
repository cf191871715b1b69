"""Table loaders over the driver's parquet fixtures (S1/S2).

Reference parity: the reference's scan is ``glob(data_path + "*.npz")`` then
per-file load + concat (``trainer/flax_model.py:102-120``). Spark's multi-file
parquet scan is the idiomatic equivalent: one declarative scan, column
pruning + predicate pushdown reach the footer, and partition planning is
handled by the data source (``maxPartitionBytes`` splits), so the same call
scales from one file to a 100 TB directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """S2: parquet scan of a named fixture table."""
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table; also registers each as a temp view so the
    same query text can run through ``spark.sql``."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
