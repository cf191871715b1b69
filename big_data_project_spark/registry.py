"""Central named-query registry.

Every operator from SURVEY.md §2 registers here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the
equivalent DuckDB oracle SQL. ``__spark_entry__.py`` re-exports this
registry to the driver, which diff-tests each query against DuckDB at
sf0.01 (row-count + schema + order-insensitive value-hash).

Parity rules baked into every registered query (SURVEY.md §4.3):
  - float aggregates rounded to 4 decimals on BOTH sides;
  - every computed column aliased identically on both sides;
  - total ordering with unique tie-break wherever LIMIT/top-k is observable;
  - integer sums cast to BIGINT in DuckDB (whose SUM(int) yields HUGEINT).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# Modules that register queries on import.
_MODULES = (
    "big_data_project_spark.operators.relational",
    "big_data_project_spark.operators.aggregates",
    "big_data_project_spark.operators.joins",
    "big_data_project_spark.operators.windows",
    "big_data_project_spark.operators.sorts",
    "big_data_project_spark.operators.sets",
    "big_data_project_spark.operators.scale",
    "big_data_project_spark.operators.behavior",
    "big_data_project_spark.operators.sql_surface",
    "big_data_project_spark.operators.sql_tpch",
    "big_data_project_spark.functions.scalar",
    "big_data_project_spark.functions.udfs",
    "big_data_project_spark.streaming.windows",
    "big_data_project_spark.pipeline.dedup",
    "big_data_project_spark.pipeline.similarity",
    "big_data_project_spark.pipeline.text",
    "big_data_project_spark.pipeline.multimodal",
    "big_data_project_spark.pipeline.curation",
    "big_data_project_spark.pipeline.quality",
    "big_data_project_spark.sources.formats",
    "big_data_project_spark.sources.python_ds",
    "big_data_project_spark.raster.vertical",
    "big_data_project_spark.raster.training",
)

_loaded = False


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a named query and (optionally) its DuckDB oracle.

    ``oracle=None`` declares a rows-only check (non-SQL-expressible op).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco


def load() -> None:
    """Import all registering modules (idempotent)."""
    global _loaded
    if _loaded:
        return
    for mod in _MODULES:
        try:
            importlib.import_module(mod)
        except ModuleNotFoundError:
            # module not built yet — registry stays partial during bring-up
            pass
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    load()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load()
    return dict(ORACLES)
