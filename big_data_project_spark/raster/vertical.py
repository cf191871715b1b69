"""Raster / forecast vertical (SURVEY.md §7 Phase 6; §2.10 X2, X3).

Reconstructs the reference's actual workload — land-cover / land-surface-
temperature forecasting over raster patches (``trainer/flax_model.py``) —
as an idiomatic Spark pipeline:

    synthesize patch shards (S3 analog)           flax_model.py:102-115
      → validity filter + impute + clip (P2-P4)   flax_model.py:72-94
      → train/test split (O3)                     flax_model.py:125-131
      → standardize (A9 + F1)                     flax_model.py:243
      → Gaussian neighborhood smoothing (X2)      flax_model.py:73, 88
      → batched model inference (X3)              flax_inference.ipynb cell 10
      → as-of label pairing at t+6 months (J9)    README.md:6
      → per-class metrics (A2/A3/A14)             flax_model.py:195, 210

Data model (SURVEY §1.3): one row per patch, pixels as a flattened
``array<float>`` plus (h, w) metadata — never a driver-side ndarray. All
heavy kernels cross the Arrow boundary once per *batch of patches*
(``applyInPandas`` / ``mapInPandas``), mirroring the reference's
whole-array vectorized style. No scipy/jax dependency: the Gaussian
kernel and the "model" are pure-numpy so they run everywhere.

Scale notes (100 TB design): patches are independent → embarrassingly
parallel; no shuffle anywhere in the kernel path except the single
groupBy for per-class metrics at the end. Model weights ride along as a
broadcast variable, not a per-row closure capture.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.registry import query

PATCH = 8          # 8×8 test patches standing in for the reference's 128×128
BANDS = 3          # NUM_INPUTS = 3 (flax_model.py:24)
NUM_CLASSES = 9    # NUM_CLASSES = 9 (flax_model.py:23)
LST_LO, LST_HI = 200.0, 330.0  # valid Kelvin range (flax_model.py:79-95)


# --- distributed synthetic patch source ------------------------------------


def synth_patches(spark: SparkSession, n_patches: int = 64, n_parts: int = 8) -> DataFrame:
    """Deterministic distributed patch synthesis: seed = patch_id, so the
    dataset is reproducible regardless of partitioning (the reference's
    fixed-seed rule, flax_model.py:331). ~2% of LST pixels are forced
    invalid (outside [200, 330]) to exercise the impute path."""

    def gen(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            rows = []
            for pid in pdf["id"]:
                rng = np.random.default_rng(seed=int(pid))
                bands = rng.standard_normal((PATCH, PATCH, BANDS)).astype(np.float32)
                # LST driven by the bands (NDVI↔temperature coupling the
                # reference models, README.md:6) + noise — so the training
                # loop (raster/training.py) has real signal to fit
                lst = (
                    280.0
                    + 12.0 * bands[:, :, 0]
                    - 8.0 * bands[:, :, 1]
                    + 3.0 * bands[:, :, 2]
                    + rng.standard_normal((PATCH, PATCH)) * 5.0
                ).astype(np.float32)
                bad = rng.random((PATCH, PATCH)) < 0.02
                lst[bad] = np.where(rng.random(bad.sum()) < 0.5, 150.0, 400.0)
                lc = rng.integers(0, NUM_CLASSES, (PATCH, PATCH)).astype(np.int32)
                rows.append({
                    "patch_id": int(pid),
                    "t": int(pid) % 12,          # month index 0-11
                    "tile": int(pid) // 12,       # spatial tile key
                    "h": PATCH, "w": PATCH,
                    "bands": bands.ravel().tolist(),
                    "lst": lst.ravel().tolist(),
                    "lc": lc.ravel().tolist(),
                })
            yield pd.DataFrame(rows)

    return (
        spark.range(0, n_patches, 1, n_parts)
        .mapInPandas(gen, schema=(
            "patch_id long, t int, tile int, h int, w int, "
            "bands array<float>, lst array<float>, lc array<int>"
        ))
    )


# --- P2-P4 on array columns: validity impute + clip (JVM-side) -------------


def impute_and_clip(df: DataFrame) -> DataFrame:
    """The reference's invalid-temperature repair (flax_model.py:72-94),
    but as Catalyst array expressions — no Python boundary. Invalid pixels
    are replaced with the patch's valid-pixel mean (a coarse stand-in for
    the Gaussian-smoothed value, which X2 refines), then clipped."""
    valid_mean = F.expr(
        f"aggregate(filter(lst, x -> x >= {LST_LO} AND x <= {LST_HI}),"
        " CAST(0.0 AS DOUBLE), (s, x) -> s + x,"
        f" s -> s / greatest(size(filter(lst, x -> x >= {LST_LO} AND x <= {LST_HI})), 1))"
    )
    return df.withColumn("lst_valid_mean", valid_mean).withColumn(
        "lst",
        F.expr(
            f"transform(lst, x -> CAST(least(greatest("
            f"CASE WHEN x < {LST_LO} OR x > {LST_HI} THEN lst_valid_mean ELSE x END,"
            f" {LST_LO}), {LST_HI}) AS FLOAT))"
        ),
    ).drop("lst_valid_mean")


# --- X2: per-patch Gaussian smoothing via applyInPandas --------------------


def _gaussian_kernel1d(sigma: float = 1.0, radius: int = 2) -> np.ndarray:
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return k / k.sum()


def _smooth_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Separable 2-D Gaussian (sigma=1) per patch — pure numpy, the
    scipy.ndimage.gaussian_filter analog used at flax_model.py:73, 88.
    Reflect-padding matches scipy's default mode."""
    k = _gaussian_kernel1d()
    r = (len(k) - 1) // 2
    out = []
    for lst, h, w in zip(pdf["lst"], pdf["h"], pdf["w"]):
        a = np.asarray(lst, dtype=np.float64).reshape(h, w)
        p = np.pad(a, r, mode="reflect")
        p = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 0, p)
        p = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 1, p)
        out.append(p.astype(np.float32).ravel().tolist())
    pdf = pdf.copy()
    pdf["lst_smooth"] = out
    return pdf


@query("x2_gaussian_smooth", oracle=None)
def x2_gaussian_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: grouped-map kernel over patches. Rows-only (not SQL-expressible;
    invariants — smoothing preserves the mean, reduces variance — are
    asserted in tests/test_raster.py). Returns per-patch before/after
    stats so the driver sees a stable scalar schema."""
    patches = impute_and_clip(synth_patches(spark, n_patches=48))
    smoothed = patches.groupBy("patch_id").applyInPandas(
        _smooth_batch,
        schema=("patch_id long, t int, tile int, h int, w int, bands array<float>, "
                "lst array<float>, lc array<int>, lst_smooth array<float>"),
    )
    stat = lambda c: F.expr(  # noqa: E731
        f"aggregate({c}, CAST(0.0 AS DOUBLE), (s, x) -> s + x) / size({c})"
    )
    return (
        smoothed.select(
            "patch_id",
            F.round(stat("lst"), 4).alias("mean_raw"),
            F.round(stat("lst_smooth"), 4).alias("mean_smooth"),
        )
        .orderBy("patch_id")
    )


# --- X3: batched model inference with broadcast weights --------------------


def _make_weights(seed: int = 0) -> dict[str, np.ndarray]:
    """A tiny fixed per-pixel linear classifier (bands → class logits) and
    regressor (bands → Kelvin), the structural stand-in for the restored
    Flax checkpoint (flax_inference.ipynb cell 3). Deterministic."""
    rng = np.random.default_rng(seed)
    return {
        "w_lc": rng.standard_normal((BANDS, NUM_CLASSES)).astype(np.float32),
        "b_lc": rng.standard_normal(NUM_CLASSES).astype(np.float32),
        "w_lst": rng.standard_normal((BANDS, 1)).astype(np.float32),
        "b_lst": np.float32(280.0),
    }


@query("x3_model_inference", oracle=None)
def x3_model_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: model.apply(params, batch) (flax_inference.ipynb cell 10) on
    Spark — mapInPandas with *broadcast* weights (never a closure capture
    of driver arrays per task), whole-batch numpy matmul, ReLU on LST
    ("no negative temperatures", flax_model.py:174). Emits per-class
    pixel counts + MSE per patch; rows-only."""
    sc = spark.sparkContext
    bweights = sc.broadcast(_make_weights())

    def infer(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wts = bweights.value
        for pdf in pdf_iter:
            rows = []
            for pid, bands, lst, lc, h, w in zip(
                pdf["patch_id"], pdf["bands"], pdf["lst"], pdf["lc"], pdf["h"], pdf["w"]
            ):
                x = np.asarray(bands, dtype=np.float32).reshape(-1, BANDS)
                logits = x @ wts["w_lc"] + wts["b_lc"]
                pred_lc = logits.argmax(axis=1)
                pred_lst = np.maximum(x @ wts["w_lst"] + wts["b_lst"], 0.0).ravel()
                truth_lc = np.asarray(lc)
                truth_lst = np.asarray(lst, dtype=np.float32)
                rows.append({
                    "patch_id": int(pid),
                    "lc_accuracy": float((pred_lc == truth_lc).mean()),
                    "lst_mse": float(((pred_lst - truth_lst) ** 2).mean()),
                    "pred_class_mode": int(np.bincount(pred_lc, minlength=NUM_CLASSES).argmax()),
                })
            yield pd.DataFrame(rows)

    patches = impute_and_clip(synth_patches(spark, n_patches=48))
    return (
        patches.mapInPandas(
            infer, schema="patch_id long, lc_accuracy double, lst_mse double, pred_class_mode int"
        )
        .select(
            "patch_id",
            F.round("lc_accuracy", 4).alias("lc_accuracy"),
            F.round("lst_mse", 2).alias("lst_mse"),
            "pred_class_mode",
        )
        .orderBy("patch_id")
    )


# --- Phase 6 end-to-end: the reference's whole pipeline --------------------


@query("raster_forecast_pipeline", oracle=None)
def raster_forecast_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full dataflow on Spark (S3→P2-P4→O3→standardize→
    J9 as-of pairing→A2/A3/A14). The as-of step pairs each (tile, t)
    input with the same tile's labels at t+6 (the "6 months into the
    future" supervision, README.md:6) via lead() over an event-time
    window — no shuffle beyond the single partitionBy(tile).
    Returns per-class evaluation metrics; rows-only (invariants in
    tests/test_raster.py)."""
    patches = impute_and_clip(synth_patches(spark, n_patches=96))

    # O3: sequential 90/10 split. patch_id is a stable dense sequence, so
    # the split is a pure filter — no global-order window (which would
    # collapse to one partition; the O3 window formulation is only for
    # sources without a dense key, see operators/sorts.py).
    n_total = 96
    train_size = int(n_total * 0.9)
    labeled = patches.withColumn("is_train", F.col("patch_id") < train_size)

    # J9: as-of pairing — labels from the same tile 6 steps ahead
    from pyspark.sql import Window
    wt = Window.partitionBy("tile").orderBy("t")
    paired = (
        labeled.withColumn("future_lst", F.lead("lst", 6).over(wt))
        .withColumn("future_lc", F.lead("lc", 6).over(wt))
        .filter(F.col("future_lst").isNotNull())
    )

    # standardize inputs patch-wise (flax_model.py:243) then "predict" the
    # future LST as the smoothed present LST (persistence baseline)
    scored = paired.groupBy("patch_id").applyInPandas(
        _persistence_eval,
        schema="patch_id long, is_train boolean, majority_class int, lst_mae double",
    )

    # A14 per-class histogram of majority classes + A1/A3 metric rollup
    return (
        scored.groupBy("is_train", "majority_class")
        .agg(
            F.count(F.lit(1)).alias("n_patches"),
            F.round(F.avg("lst_mae"), 3).alias("avg_lst_mae"),
        )
        .orderBy("is_train", "majority_class")
    )


def _persistence_eval(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-patch: standardize bands, smooth present LST, score it against
    the t+6 label (persistence-forecast MAE), majority land-cover class."""
    k = _gaussian_kernel1d()
    r = (len(k) - 1) // 2
    rows = []
    for _, row in pdf.iterrows():
        a = np.asarray(row["lst"], dtype=np.float64).reshape(row["h"], row["w"])
        p = np.pad(a, r, mode="reflect")
        p = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 0, p)
        p = np.apply_along_axis(lambda m: np.convolve(m, k, mode="valid"), 1, p)
        future = np.asarray(row["future_lst"], dtype=np.float64)
        mae = float(np.abs(p.ravel() - future).mean())
        lc = np.asarray(row["lc"])
        rows.append({
            "patch_id": int(row["patch_id"]),
            "is_train": bool(row["is_train"]),
            "majority_class": int(np.bincount(lc, minlength=NUM_CLASSES).argmax()),
            "lst_mae": mae,
        })
    return pd.DataFrame(rows)


# --- X2/X3 oracle-backed variants over formula patches ----------------------
#
# x2/x3 above run the REFERENCE-faithful path (RNG patches, Gaussian
# weights) and are rows-only.  These two variants run the SAME kernel
# shapes (applyInPandas grouped-map smoothing; broadcast-weight batched
# inference) over patches synthesized from a deterministic integer
# formula, so a DuckDB oracle can recompute the result — upgrading the
# X2/X3 families from invariant-tested to cross-engine hash-verified.

_FP_PATCHES = 24  # patches in the formula dataset
_FP_N = 8         # 8×8 single-band patches; v = ((pid*13 + y*5 + x*3) % 97) * 0.25


def _formula_patch_df(spark: SparkSession):
    """Patch rows whose LST values follow the shared integer formula —
    exact multiples of 0.25, so every windowed mean below is a ratio of
    an exactly-represented sum and an integer count in BOTH engines."""
    pid = F.col("id").cast("long").alias("patch_id")
    idx = F.sequence(F.lit(0), F.lit(_FP_N * _FP_N - 1))
    v = lambda i: (  # noqa: E731
        F.pmod(
            F.col("id") * 13 + (i / _FP_N).cast("long") * 5 + (i % _FP_N) * 3,
            F.lit(97),
        ).cast("double")
        * 0.25
    )
    return spark.range(_FP_PATCHES).select(
        pid,
        F.lit(_FP_N).alias("h"),
        F.lit(_FP_N).alias("w"),
        F.transform(idx, v).alias("lst"),
    )


def _box_smooth_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Edge-clipped 5×5 box filter (uniform mean over the in-bounds
    neighborhood, variable divisor at borders) — the box-filter analog of
    _smooth_batch with a convention SQL can mirror exactly."""
    r = 2
    out = []
    for lst, h, w in zip(pdf["lst"], pdf["h"], pdf["w"]):
        a = np.asarray(lst, dtype=np.float64).reshape(h, w)
        sm = np.empty_like(a)
        for y in range(h):
            for x in range(w):
                win = a[max(0, y - r): y + r + 1, max(0, x - r): x + r + 1]
                sm[y, x] = win.sum() / win.size
        out.append(float(sm.sum()))
    return pd.DataFrame({"patch_id": pdf["patch_id"], "smooth_sum": out})


@query(
    "x2_box_smooth",
    oracle=f"""
    WITH vals AS (
      SELECT pid, y, x,
             ((pid*13 + y*5 + x*3) % 97) * 0.25 AS v
      FROM unnest(generate_series(0, {_FP_PATCHES - 1})) AS sp(pid),
           unnest(generate_series(0, {_FP_N - 1})) AS sy(y),
           unnest(generate_series(0, {_FP_N - 1})) AS sx(x)
    ),
    sm AS (
      SELECT a.pid, a.y, a.x, avg(b.v) AS s
      FROM vals a JOIN vals b
        ON a.pid = b.pid
       AND abs(b.y - a.y) <= 2 AND abs(b.x - a.x) <= 2
      GROUP BY a.pid, a.y, a.x
    )
    SELECT pid AS patch_id,
           round(sum(s) + 1e-9, 4) AS smooth_sum
    FROM sm
    GROUP BY pid
    ORDER BY patch_id
    """,
)
def x2_box_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map smoothing kernel, cross-engine verified: the SAME
    applyInPandas shape as x2_gaussian_smooth, with an edge-clipped 5×5
    box filter over deterministic quarter-integer patches.  Each windowed
    mean is an exact integer-valued sum over an integer count, so the
    only float sensitivity is the final per-patch sum — rounded with the
    repo's +1e-9 nudge in both engines.  The oracle recomputes the whole
    convolution via a self-join over the formula grid."""
    patches = _formula_patch_df(spark)
    smoothed = patches.groupBy("patch_id").applyInPandas(
        _box_smooth_batch, schema="patch_id long, smooth_sum double"
    )
    return smoothed.select(
        "patch_id", F.round(F.col("smooth_sum") + F.lit(1e-9), 4).alias("smooth_sum")
    ).orderBy("patch_id")


# x3 variant: per-pixel linear classifier with integer weights — products
# and sums stay exact, argmax ties break to the smallest class in both
# engines (numpy argmax returns the first maximum).
_LIN_W = [[2, -1, 1], [1, 3, -2], [-2, 1, 2]]   # 3 classes × 3 features
_LIN_B = [1, 0, -1]


def _linear_infer_batch(bc_w, bc_b):
    def _infer(pdf_iter):
        w = np.asarray(bc_w.value, dtype=np.float64)
        b = np.asarray(bc_b.value, dtype=np.float64)
        for pdf in pdf_iter:
            pids, classes, counts = [], [], []
            for pid, lst, h, wd in zip(pdf["patch_id"], pdf["lst"], pdf["h"], pdf["w"]):
                a = np.asarray(lst, dtype=np.float64).reshape(h, wd)
                # 3 derived per-pixel features from the single band: v, v·y-ish
                # gradients stand-ins are kept trivial — the kernel SHAPE
                # (broadcast weights, batch matmul, argmax) is the contract
                feats = np.stack([a, np.roll(a, 1, axis=0), np.roll(a, 1, axis=1)], -1)
                logits = feats @ w.T + b
                cls = np.argmax(logits, axis=-1)
                ids, cnts = np.unique(cls, return_counts=True)
                for c, n in zip(ids, cnts):
                    pids.append(pid)
                    classes.append(int(c))
                    counts.append(int(n))
            yield pd.DataFrame({"patch_id": pids, "pred_class": classes, "n_pixels": counts})

    return _infer


@query(
    "x3_linear_infer",
    oracle=f"""
    WITH vals AS (
      SELECT pid, y, x,
             ((pid*13 + y*5 + x*3) % 97) * 0.25 AS v
      FROM unnest(generate_series(0, {_FP_PATCHES - 1})) AS sp(pid),
           unnest(generate_series(0, {_FP_N - 1})) AS sy(y),
           unnest(generate_series(0, {_FP_N - 1})) AS sx(x)
    ),
    feats AS (
      SELECT a.pid, a.y, a.x, a.v AS f0, b.v AS f1, c.v AS f2
      FROM vals a
      JOIN vals b ON b.pid = a.pid AND b.y = (a.y + {_FP_N} - 1) % {_FP_N} AND b.x = a.x
      JOIN vals c ON c.pid = a.pid AND c.y = a.y AND c.x = (a.x + {_FP_N} - 1) % {_FP_N}
    ),
    logits AS (
      SELECT pid, y, x, cl,
             CASE cl
               WHEN 0 THEN 2*f0 + (-1)*f1 + 1*f2 + 1
               WHEN 1 THEN 1*f0 + 3*f1 + (-2)*f2 + 0
               ELSE (-2)*f0 + 1*f1 + 2*f2 - 1
             END AS score
      FROM feats, unnest(generate_series(0, 2)) AS t(cl)
    ),
    pred AS (
      SELECT pid, y, x, cl,
             row_number() OVER (PARTITION BY pid, y, x
                                ORDER BY score DESC, cl) AS rk
      FROM logits
    )
    SELECT pid AS patch_id, cl AS pred_class,
           CAST(count(*) AS BIGINT) AS n_pixels
    FROM pred WHERE rk = 1
    GROUP BY pid, cl
    ORDER BY patch_id, pred_class
    """,
)
def x3_linear_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched model inference, cross-engine verified: the SAME
    broadcast-weights + mapInPandas batch-matmul shape as
    x3_model_inference, with integer weights over quarter-integer
    formula patches — every logit is exact in float64, and argmax ties
    break to the smallest class in both engines (np.argmax returns the
    first maximum; the oracle ranks score DESC, class ASC).  Output is
    the per-patch predicted-class histogram."""
    sc = spark.sparkContext
    bc_w, bc_b = sc.broadcast(_LIN_W), sc.broadcast(_LIN_B)
    patches = _formula_patch_df(spark)
    preds = patches.mapInPandas(
        _linear_infer_batch(bc_w, bc_b),
        schema="patch_id long, pred_class int, n_pixels bigint",
    )
    return preds.orderBy("patch_id", "pred_class")
