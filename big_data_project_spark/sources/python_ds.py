"""S14: custom pure-Python DataSource (Spark 4 Python Data Source API).

The reference's patch dataset was produced by a missing Beam + Earth
Engine extraction pipeline (SURVEY §0: `.MISSING_LARGE_BLOBS:1-2`,
`README.md:17-18`) — an external service read through a custom source.
This is that source's Spark-native shape: a DataSource subclass whose
reader splits the tile grid into InputPartitions, so extraction
parallelizes across executors like any other scan (predicate/column
behavior rides on top as normal Catalyst ops).

Determinism: each partition seeds its own RNG from the partition id, so
the emitted patch metadata is identical across runs and executors —
the same reproducibility rule the engine applies everywhere
(SURVEY §4.3.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from big_data_project_spark.registry import query

_SCHEMA = "patch_id bigint, tile_x int, tile_y int, ndvi_mean double, lst_mean double"
_N_PARTS = 4


def _register_source(spark: SparkSession) -> None:
    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class RasterPatchReader(DataSourceReader):
        def __init__(self, options):
            self.per_part = int(options.get("patches_per_partition", "16"))

        def partitions(self):
            return [InputPartition(i) for i in range(_N_PARTS)]

        def read(self, partition):
            import numpy as np

            pid = partition.value
            rng = np.random.default_rng(seed=1000 + pid)
            for i in range(self.per_part):
                patch_id = pid * self.per_part + i
                yield (
                    patch_id,
                    int(patch_id % 8),
                    int(patch_id // 8),
                    float(np.round(rng.uniform(-0.2, 0.9), 4)),
                    float(np.round(rng.uniform(250.0, 320.0), 4)),
                )

    class RasterPatchSource(DataSource):
        @classmethod
        def name(cls):
            return "raster_patches"

        def schema(self):
            return _SCHEMA

        def reader(self, schema):
            return RasterPatchReader(self.options)

    spark.dataSource.register(RasterPatchSource)


@query("s14_python_datasource", oracle=None)
def s14_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan the custom Python source and aggregate per tile row — the
    extraction-service read expressed as a first-class Spark scan with
    real partition parallelism (4 InputPartitions). Values are
    engine-synthesized (no fixture table) → rows-only; determinism and
    partition fan-out are pinned in tests/test_pipeline.py."""
    from pyspark.sql import functions as F

    _register_source(spark)
    df = spark.read.format("raster_patches").option("patches_per_partition", "16").load()
    return (
        df.groupBy("tile_y")
        .agg(
            F.count(F.lit(1)).alias("n_patches"),
            F.round(F.avg("ndvi_mean") + F.lit(1e-9), 4).alias("avg_ndvi"),
            F.round(F.avg("lst_mean") + F.lit(1e-9), 4).alias("avg_lst"),
        )
        .orderBy("tile_y")
    )
