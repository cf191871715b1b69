"""Invariant tests for the Phase-6 raster/forecast vertical (rows-only ops).

Mirrors the reference's validation style (SURVEY §5.1): shape asserts,
seeded reproducibility, and physical-plausibility checks instead of an
SQL oracle.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from big_data_project_spark.raster.vertical import (
    LST_HI,
    LST_LO,
    impute_and_clip,
    synth_patches,
)
from big_data_project_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def test_synth_is_deterministic_across_partitionings(spark):
    a = synth_patches(spark, n_patches=16, n_parts=2)
    b = synth_patches(spark, n_patches=16, n_parts=7)
    pa = a.orderBy("patch_id").toPandas()
    pb = b.orderBy("patch_id").toPandas()
    assert list(pa["patch_id"]) == list(pb["patch_id"])
    for i in range(len(pa)):
        np.testing.assert_array_equal(pa["lst"][i], pb["lst"][i])


def test_impute_clips_all_lst_into_valid_range(spark):
    df = impute_and_clip(synth_patches(spark, n_patches=16))
    bounds = df.select(
        F.expr("min(array_min(lst))").alias("lo"),
        F.expr("max(array_max(lst))").alias("hi"),
    ).collect()[0]
    assert bounds["lo"] >= LST_LO and bounds["hi"] <= LST_HI


def test_x2_smoothing_preserves_mean(spark):
    out = all_queries()["x2_gaussian_smooth"](spark, SF).toPandas()
    assert len(out) == 48
    # reflect-padded Gaussian is mean-preserving to ~0.1 K on 8x8 patches
    assert (out["mean_raw"] - out["mean_smooth"]).abs().max() < 2.0


def test_x3_inference_schema_and_ranges(spark):
    out = all_queries()["x3_model_inference"](spark, SF).toPandas()
    assert len(out) == 48
    assert out["lc_accuracy"].between(0.0, 1.0).all()
    assert (out["lst_mse"] >= 0).all()
    assert out["pred_class_mode"].between(0, 8).all()


def test_training_loop_loss_decreases(spark):
    out = all_queries()["raster_training_loop"](spark, SF).toPandas()
    assert len(out) == 12
    mses = out.sort_values("epoch")["mse"].tolist()
    # convex problem + small fixed lr → strictly decreasing loss
    assert all(a > b for a, b in zip(mses, mses[1:])), mses
    assert mses[-1] < mses[0] * 0.9


def test_raster_pipeline_end_to_end(spark):
    out = all_queries()["raster_forecast_pipeline"](spark, SF).toPandas()
    # 96 patches, 8 tiles of 12 months, lead-6 leaves 6 per tile = 48 scored
    assert out["n_patches"].sum() == 48
    assert out["majority_class"].between(0, 8).all()
    assert (out["avg_lst_mae"] > 0).all()
