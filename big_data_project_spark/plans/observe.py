"""Single-pass pipeline observability via ``DataFrame.observe``.

The reference logs per-epoch metrics as a side effect of the training
pass (``trainer/flax_model.py:371-375`` — the metrics come from the same
forward pass that does the work, not a second one). The Spark-native
equivalent is ``observe``: accumulator-backed aggregates evaluated while
the action runs, so gate pass-rates and null counts on a 100 TB curation
job cost ZERO extra scans — the naive alternative (a ``.count()`` per
gate) re-reads the corpus once per metric.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.io import load_table
from big_data_project_spark.pipeline.curation import (
    LANGS, MAX_DIGIT_RATIO, MIN_CHARS, MIN_WORDS,
)


def observed_quality_gate(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, Observation, Observation]:
    """The curation quality/language gate instrumented at both ends.

    Returns (gated_df, obs_in, obs_out); after ONE action on gated_df the
    observations hold input volume, null/violation counters, and output
    volume + length stats — all from the same scan that did the gating.
    """
    obs_in = Observation("docs_in")
    obs_out = Observation("docs_out")
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    digits = F.length(F.regexp_replace("text", r"[^0-9]", ""))
    instrumented = d.observe(
        obs_in,
        F.count(F.lit(1)).alias("rows_in"),
        F.count(F.when(F.col("text").isNull(), 1)).alias("null_text"),
        F.count(F.when(F.length("text") < MIN_CHARS, 1)).alias("too_short"),
        F.count(F.when(~F.col("lang").isin(*LANGS), 1)).alias("lang_rejected"),
    )
    gated = instrumented.filter(
        (F.length("text") >= MIN_CHARS)
        & (F.size(words) >= MIN_WORDS)
        & (digits / F.length("text") <= MAX_DIGIT_RATIO)
        & F.col("lang").isin(*LANGS)
    ).observe(
        obs_out,
        F.count(F.lit(1)).alias("rows_out"),
        F.round(F.avg(F.length("text")), 2).alias("avg_len"),
    )
    return gated, obs_in, obs_out
