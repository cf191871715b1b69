"""Distributed training loop (reference §3.1 lifecycle:
``train_and_evaluate``, flax_model.py:318-391) re-expressed Spark-first.

The reference's epoch loop is: permute → batch → forward/backward on
device → update params → eval → metrics sink → checkpoint keep=3. The
Spark translation is data-parallel full-batch gradient descent:

  - params live on the driver, shipped per epoch as a **broadcast**
    (the model.apply(params, batch) pattern of X3);
  - each partition computes a partial (gradient, loss, count) over its
    pixels via one numpy matmul per Arrow batch — map-side combine,
    exactly like a partial aggregation;
  - the driver sums the tiny per-partition partials and takes the step
    (the only data that ever reaches the driver is O(n_features));
  - per-epoch metrics append to the S7 sink shape; checkpoints keep=3
    via the S6 helper.

This is the parameter-server-free pattern that scales: gradient traffic
is (#partitions × #features) floats per epoch regardless of data size.
The model is the LST head generalized: linear bands→Kelvin regression
(flax_model.py:172-176 minus the conv stack, which is X2/X3 territory).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.raster.vertical import BANDS, impute_and_clip, synth_patches
from big_data_project_spark.registry import query


def pixel_table(spark: SparkSession, n_patches: int = 64) -> DataFrame:
    """Patches → one row per pixel (bands array, lst target): the
    flattened design-matrix view. Train split = first 90% of patch ids
    (dense-key split, no global window)."""
    patches = impute_and_clip(synth_patches(spark, n_patches=n_patches))
    train = patches.filter(F.col("patch_id") < int(n_patches * 0.9))
    return train.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(lst) - 1), "
                f"i -> struct(slice(bands, i * {BANDS} + 1, {BANDS}) AS x, lst[i] AS y))"
            )
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))


def train_linear_lst(
    spark: SparkSession,
    pixels: DataFrame,
    epochs: int = 12,
    lr: float = 0.05,
) -> list[dict]:
    """Full-batch GD on standardized features. Returns per-epoch metrics
    (the reference's summary_writer.scalar series, flax_model.py:371-375).
    Deterministic: fixed init, fixed data, associative-sum gradients of
    float64 partials."""
    sc = spark.sparkContext
    pixels = pixels.persist()

    # standardization stats (A9 + F1, flax_model.py:243) — one pass
    stats = pixels.select(
        F.mean("y").alias("my"),
        *[F.mean(F.col("x")[i]).alias(f"mx{i}") for i in range(BANDS)],
        *[F.stddev_samp(F.col("x")[i]).alias(f"sx{i}") for i in range(BANDS)],
    ).collect()[0]
    mx = np.array([stats[f"mx{i}"] for i in range(BANDS)])
    sx = np.array([max(stats[f"sx{i}"], 1e-9) for i in range(BANDS)])
    my = float(stats["my"])

    w = np.zeros(BANDS)  # deterministic init (jax.random.key(0) analog)
    b = 0.0
    history: list[dict] = []

    for epoch in range(epochs):
        bparams = sc.broadcast({"w": w, "b": b, "mx": mx, "sx": sx, "my": my})

        def partials(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            p = bparams.value
            gw = np.zeros(BANDS)
            gb = 0.0
            loss = 0.0
            n = 0
            for pdf in pdf_iter:
                X = (np.vstack(pdf["x"].to_numpy()) - p["mx"]) / p["sx"]
                y = pdf["y"].to_numpy(dtype=np.float64) - p["my"]
                err = X @ p["w"] + p["b"] - y
                gw += X.T @ err
                gb += float(err.sum())
                loss += float((err * err).sum())
                n += len(err)
            yield pd.DataFrame({
                "gw": [gw.tolist()], "gb": [gb], "loss": [loss], "n": [n]
            })

        agg = pixels.mapInPandas(
            partials, schema="gw array<double>, gb double, loss double, n long"
        ).groupBy().agg(
            F.array(*[F.sum(F.col("gw")[i]) for i in range(BANDS)]).alias("gw"),
            F.sum("gb").alias("gb"),
            F.sum("loss").alias("loss"),
            F.sum("n").alias("n"),
        ).collect()[0]

        n = agg["n"]
        w = w - lr * np.array(agg["gw"]) / n
        b = b - lr * agg["gb"] / n
        history.append({"epoch": epoch, "mse": agg["loss"] / n})
        bparams.destroy()

    pixels.unpersist()
    return history


@query("raster_training_loop", oracle=None)
def raster_training_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's training lifecycle end-to-end: returns the
    per-epoch loss series (must be monotonically non-increasing for this
    convex problem — asserted in tests/test_raster.py). Rows-only."""
    history = train_linear_lst(spark, pixel_table(spark))
    return spark.createDataFrame(
        [(h["epoch"], round(h["mse"], 6)) for h in history],
        schema="epoch int, mse double",
    ).orderBy("epoch")
