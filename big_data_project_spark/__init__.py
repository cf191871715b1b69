"""big_data_project_spark — a PySpark-native analytics engine.

A ground-up re-expression of the query and data-processing capabilities of
the reference project ``rohitp934/big_data_project`` (a land-cover /
land-surface-temperature forecasting pipeline; see SURVEY.md) as an
idiomatic Spark DataFrame/SQL engine, plus the LLM-data-pipeline operators
(dedup, similarity search, multimodal columns, text analysis) required for
large-scale training-data preparation.

Public surface:
    - :mod:`big_data_project_spark.session` — tuned SparkSession builder
    - :mod:`big_data_project_spark.io` — table loaders over the parquet fixtures
    - :mod:`big_data_project_spark.registry` — named query registry with
      DuckDB oracle SQL, consumed by ``__spark_entry__.py``
"""

__version__ = "0.1.0"
