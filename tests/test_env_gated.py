"""Auto-activating probes for the two environment-bound gaps (VERDICT r07
stretch item): the tests below skip while the sandbox lacks the dependency
and run — with no code change — the moment it appears.

  - PIL        → the real-codec decode/resize branches in
                 pipeline/multimodal.py (the fake-codec plumbing is
                 oracle-verified every round; these verify the real kernel
                 bodies against pixels PIL itself produced).
  - protobuf   → transformWithStateInPandas (Spark 4's v2 stateful API,
                 whose state-server protocol imports google.protobuf);
                 T6 is driver-green via the v1 applyInPandasWithState
                 operator either way (streaming/windows.py:239).
"""

from __future__ import annotations

import importlib.util

import pytest


def _has(mod: str) -> bool:
    # find_spec on a dotted name raises ModuleNotFoundError when the
    # PARENT package is absent (google.protobuf without google) — that
    # absence is exactly what we're probing, not an error.
    try:
        return importlib.util.find_spec(mod) is not None
    except ModuleNotFoundError:
        return False


HAS_PIL = _has("PIL")
HAS_PROTOBUF = _has("google.protobuf")


@pytest.mark.skipif(not HAS_PIL, reason="activates when PIL lands in the sandbox")
def test_real_codec_decode_reads_pixels_not_metadata(spark):
    """The real-codec branch must decode the payload: width/height/luma
    come from the pixels, overriding whatever the metadata claimed."""
    import io

    from PIL import Image

    from big_data_project_spark.pipeline.multimodal import (
        DECODED_SCHEMA, decode_features,
    )

    buf = io.BytesIO()
    Image.new("L", (6, 4), color=128).save(buf, "PNG")
    png = buf.getvalue()
    # metadata lies (99×99): the decoded row must say 6×4 anyway
    df = spark.createDataFrame(
        [(1, bytearray(png), 99, 99)],
        "doc_id long, payload binary, width int, height int",
    )
    rows = df.mapInPandas(
        lambda it: decode_features(it, use_real_codec=True), DECODED_SCHEMA
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.width, r.height) == (6, 4)
    assert r.n_bytes == len(png)
    assert abs(r.fake_mean_luma - 128 / 255.0) < 1e-9
    assert r.header_u32 == int.from_bytes(png[:4], "little")


@pytest.mark.skipif(not HAS_PIL, reason="activates when PIL lands in the sandbox")
def test_real_codec_resize_bounds_output_by_target(spark):
    """The real resize kernel must emit exactly target_w×target_h pixel
    buffers regardless of input size — the mixed-resolution-corpus
    safety property the stub documents."""
    import io

    from PIL import Image

    from big_data_project_spark.pipeline.multimodal import (
        RESIZED_SCHEMA, resize_kernel,
    )

    def png(w: int, h: int, color: int) -> bytearray:
        buf = io.BytesIO()
        Image.new("L", (w, h), color=color).save(buf, "PNG")
        return bytearray(buf.getvalue())

    df = spark.createDataFrame(
        [(1, png(100, 80, 10)), (2, png(3, 2, 200))],
        "doc_id long, payload binary",
    )
    rows = df.mapInPandas(
        resize_kernel(8, 5, use_real_codec=True), RESIZED_SCHEMA
    ).collect()
    assert {(r.out_w, r.out_h, r.n_bytes_out) for r in rows} == {(8, 5, 40)}
    sums = {r.doc_id: r.checksum for r in rows}
    assert sums[1] == 40 * 10 and sums[2] == 40 * 200  # solid-color resample


@pytest.mark.skipif(
    not HAS_PROTOBUF, reason="activates when google.protobuf lands in the sandbox"
)
def test_transform_with_state_v2_per_key_count(spark, tmp_path):
    """transformWithStateInPandas (the v2 stateful API): a per-user
    running event count over two scripted micro-batches must carry
    ValueState across batches — the v2 form of the T6 operator
    (streaming/windows.py:239 documents the v1↔v2 port).  Mirrors
    test_t6_stateful_running_count's file-source + availableNow script."""
    import pandas as pd

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    from big_data_project_spark.streaming.runner import (
        run_available_now, stream_events_from_dir,
    )
    from tests.test_streaming import _write_batch

    class CountProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", "n long")

        def handleInputRows(self, key, rows, timerValues):
            n = self._count.get()[0] if self._count.exists() else 0
            for pdf in rows:
                n += len(pdf)
            self._count.update((n,))
            yield pd.DataFrame({"user_id": [key[0]], "total_events": [n]})

        def close(self) -> None:
            pass

    import os

    input_dir, out_dir, ck = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck"),
    )
    os.makedirs(input_dir)
    os.makedirs(out_dir)

    def run_pass():
        stream = stream_events_from_dir(spark, input_dir)
        counted = stream.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=CountProcessor(),
            outputStructType="user_id long, total_events long",
            outputMode="Update",
            timeMode="None",
        )

        def sink(df, batch_id):
            if df.count():
                df.write.mode("append").parquet(out_dir)

        run_available_now(counted, out_dir, ck, output_mode="update",
                          foreach_batch=sink)

    _write_batch(spark, [
        (1, "2024-06-01 00:01:00", 7, "view", 1.0),
        (2, "2024-06-01 00:02:00", 7, "view", 1.0),
        (3, "2024-06-01 00:03:00", 8, "view", 1.0),
    ], input_dir, "b1")
    run_pass()
    _write_batch(spark, [
        (4, "2024-06-01 00:04:00", 7, "view", 1.0),
    ], input_dir, "b2")
    run_pass()

    out = spark.read.parquet(out_dir).toPandas()
    final = out.groupby("user_id").total_events.max()
    assert final[7] == 3  # state carried: 2 from batch1 + 1 from batch2
    assert final[8] == 1
