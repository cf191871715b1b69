"""Multimodal columns (SURVEY.md §2.10 X10): opaque binary payloads with
typed metadata, processed by Arrow-batched Python kernels.

The container has no image/audio codecs, so the *decode* step is stubbed
(deterministic fake features; the real-codec branch raises
NotImplementedError) — but the Spark-side plumbing is real: BinaryType
columns, metadata structs, mapInPandas with an explicit output schema,
Arrow batch sizing. At 100 TB the payload column dominates I/O; the design
keeps metadata in a separate narrow projection so pruning skips payload
bytes entirely for metadata-only queries (parquet column pruning does this
for free — which is why payload and metadata live in separate columns, not
one struct).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from big_data_project_spark.io import load_table
from big_data_project_spark.registry import query

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, header_u32 long, byte_sum long, "
    "width int, height int, fake_mean_luma double"
)


def attach_payload(d: DataFrame) -> DataFrame:
    """Manufacture a deterministic binary 'image' payload per document
    (UTF-8 bytes of the text — stands in for JPEG bytes) plus a typed
    metadata struct, as a multimodal ingestion would."""
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("fake/jpeg").alias("mime"),
            F.pmod(F.col("doc_id") * 37, F.lit(640)).cast("int").alias("width"),
            F.pmod(F.col("doc_id") * 53, F.lit(480)).cast("int").alias("height"),
            F.col("n_chars").alias("source_bytes"),
        ).alias("meta"),
    )


def decode_features(pdf_iter: Iterator[pd.DataFrame], use_real_codec: bool = False
                    ) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode': real codecs are unavailable in this
    container, so the feature extractor is a deterministic fake over the
    raw bytes. The batch shape/schema contract is exactly what a real
    PIL/ffmpeg kernel would use — and when PIL IS importable (a real
    cluster), ``use_real_codec=True`` decodes for real: width/height and
    mean luma come from the pixels, not the metadata.  The activating
    test (tests/test_env_gated.py) un-skips itself the moment the
    sandbox gains PIL."""
    if use_real_codec:
        try:
            from PIL import Image
        except ImportError as exc:  # pragma: no cover - env-bound
            raise NotImplementedError(
                "image codecs are not installed in this environment; the "
                "real-codec branch activates when PIL is importable "
                "(audio/video analogs: torchaudio.load / ffmpeg)"
            ) from exc
        import io as _io

        import numpy as np

        def _decode(b: bytes) -> tuple[int, int, float]:
            img = Image.open(_io.BytesIO(b)).convert("L")
            # C-side mean over the pixel buffer — a Python list/sum here
            # would cost an O(pixels) interpreted loop per image, dwarfing
            # the decode itself on megapixel inputs
            arr = np.asarray(img, dtype=np.float64)
            luma = float(arr.mean()) if arr.size else 0.0
            return img.width, img.height, luma / 255.0

        for pdf in pdf_iter:
            payloads = pdf["payload"]
            decoded = payloads.map(_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len),
                    "header_u32": payloads.map(
                        lambda b: int.from_bytes(b[:4].ljust(4, b"\0"), "little")
                    ),
                    "byte_sum": payloads.map(lambda b: sum(b)),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "fake_mean_luma": decoded.map(lambda t: t[2]),
                }
            )
        return
    for pdf in pdf_iter:
        payloads = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len),
                "header_u32": payloads.map(
                    lambda b: int.from_bytes(b[:4].ljust(4, b"\0"), "little")
                ),
                "byte_sum": payloads.map(lambda b: sum(b)),
                "width": pdf["width"],
                "height": pdf["height"],
                "fake_mean_luma": payloads.map(lambda b: (sum(b) / max(len(b), 1)) / 255.0),
            }
        )


@query(
    "x10_multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           CAST(doc_id * 37 % 640 AS INT) AS width,
           CAST(doc_id * 53 % 480 AS INT) AS height,
           'fake/jpeg' AS mime
    FROM documents
    """,
)
def x10_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only projection over the multimodal table — the query shape
    that must NOT read payload bytes (verified via ReadSchema pruning in
    tests/test_plans.py)."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_payload(d)
    return m.select(
        "doc_id",
        F.length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.mime").alias("mime"),
    )


RESIZED_SCHEMA = "doc_id long, out_w int, out_h int, n_bytes_out long, checksum long"


def resize_kernel(target_w: int, target_h: int, use_real_codec: bool = False):
    """Resize stub with the real kernel's contract: fixed output dims,
    payload shrunk by deterministic byte subsampling (stands in for
    bilinear downsample). Per-row output size is bounded by the TARGET,
    not the input — the property that makes a mixed-resolution 100 TB
    corpus safe to batch through Arrow."""

    def _resize(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if use_real_codec:
            try:
                from PIL import Image
            except ImportError as exc:  # pragma: no cover - env-bound
                raise NotImplementedError(
                    "image codecs are not installed in this environment; "
                    "the real-codec branch activates when PIL is "
                    "importable (cv2.resize is the other real kernel)"
                ) from exc
            import io as _io

            def _real(b: bytes) -> bytes:
                img = Image.open(_io.BytesIO(b)).convert("L")
                return img.resize((target_w, target_h)).tobytes()

            for pdf in pdf_iter:
                out = pdf["payload"].map(_real)
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "out_w": target_w,
                    "out_h": target_h,
                    "n_bytes_out": out.map(len),
                    "checksum": out.map(lambda b: sum(b)),
                })
            return
        budget = target_w * target_h
        for pdf in pdf_iter:
            out = pdf["payload"].map(
                lambda b: b[:: max(1, len(b) // budget)][:budget]
            )
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "out_w": target_w,
                "out_h": target_h,
                "n_bytes_out": out.map(len),
                "checksum": out.map(lambda b: sum(b)),
            })

    return _resize


@query(
    "x10_multimodal_resize",
    oracle="""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ), s AS (
      SELECT doc_id, hx, n, greatest(n // 256, 1) AS step FROM p
    ), sel AS (
      SELECT doc_id, hx, step,
             least(CAST(ceil(n * 1.0 / step) AS BIGINT), 256) AS n_sel
      FROM s
    ), j AS (
      SELECT doc_id, hx, step, n_sel,
             unnest(generate_series(0, n_sel - 1)) AS j
      FROM sel WHERE n_sel > 0
    ), vals AS (
      SELECT doc_id, n_sel,
             CAST(('0x' || substr(hx, CAST(2 * j * step + 1 AS INT), 2))
                  AS BIGINT) AS byte
      FROM j
    ), agg AS (
      SELECT doc_id, CAST(min(n_sel) AS BIGINT) AS n_bytes_out,
             CAST(sum(byte) AS BIGINT) AS checksum
      FROM vals GROUP BY doc_id
    )
    SELECT p.doc_id, CAST(32 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
           COALESCE(a.n_bytes_out, 0) AS n_bytes_out,
           COALESCE(a.checksum, 0) AS checksum
    FROM p LEFT JOIN agg a USING (doc_id)
    """,
)
def x10_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch resize of every payload to 32×8 via mapInPandas.  The fake
    kernel (deterministic byte subsampling: b[::max(1, len//256)][:256])
    is mirrored byte-for-byte in the DuckDB oracle via hex-pair
    extraction, so the full Arrow plumbing — BinaryType column, batch
    kernel, output schema — is hash-verified, not just row-counted.
    Output-size bound and determinism additionally asserted in
    tests/test_pipeline.py."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_payload(d).select("doc_id", "payload")
    return m.mapInPandas(resize_kernel(32, 8), schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = "doc_id long, frame_idx int, frame_bytes long, frame_checksum long"


def frame_sample_kernel(frame_size: int, every_k: int):
    """Frame sampling for video-shaped payloads: chunk the byte stream
    into fixed-size frames, emit every k-th — one input row fans out to
    many frame rows (the UDTF shape). A real kernel swaps the chunker
    for an ffmpeg keyframe iterator; the fan-out schema, batch shape,
    and bounded per-frame size are identical."""

    def _sample(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            ids, idxs, sizes, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [
                    payload[o : o + frame_size]
                    for o in range(0, len(payload), frame_size)
                ]
                for i in range(0, len(frames), every_k):
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(frames[i]))
                    sums.append(sum(frames[i]))
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": idxs,
                "frame_bytes": sizes, "frame_checksum": sums,
            })

    return _sample


@query(
    "x10_frame_sample",
    oracle="""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ), f AS (
      SELECT doc_id, hx, n, CAST(ceil(n * 1.0 / 16) AS BIGINT) AS n_frames
      FROM p
    ), fi AS (
      SELECT doc_id, hx, n, unnest(generate_series(0, n_frames - 1)) AS i
      FROM f WHERE n_frames > 0
    ), kept AS (
      SELECT * FROM fi WHERE i % 4 = 0
    ), vals AS (
      SELECT doc_id, i,
             CAST(('0x' || substr(hx, CAST(2 * (i * 16 + k) - 1 AS INT), 2))
                  AS BIGINT) AS byte
      FROM (SELECT doc_id, hx, i,
                   unnest(generate_series(1, least(16, n - i * 16))) AS k
            FROM kept)
    )
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           CAST(count(*) AS BIGINT) AS frame_bytes,
           CAST(sum(byte) AS BIGINT) AS frame_checksum
    FROM vals GROUP BY doc_id, i
    """,
)
def x10_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample every 4th 16-byte 'frame' from each payload — the one-row→
    many-frames fan-out a video keyframe sampler produces.  The chunking
    arithmetic is mirrored byte-for-byte in the DuckDB oracle (hex-pair
    extraction), so frame indices, sizes, and checksums are
    hash-verified; frame-count arithmetic additionally asserted in
    tests/test_pipeline.py."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_payload(d).select("doc_id", "payload")
    return m.mapInPandas(frame_sample_kernel(16, 4), schema=FRAMES_SCHEMA)


@query(
    "x10_multimodal_decode",
    oracle="""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ), vals AS (
      SELECT doc_id, i,
             CAST(('0x' || substr(hx, CAST(2 * i - 1 AS INT), 2)) AS BIGINT)
               AS byte
      FROM (SELECT doc_id, hx, unnest(generate_series(1, n)) AS i
            FROM p WHERE n > 0)
    ), agg AS (
      SELECT doc_id,
             CAST(sum(byte) AS BIGINT) AS byte_sum,
             CAST(sum(byte * CASE i WHEN 1 THEN 1 WHEN 2 THEN 256
                                    WHEN 3 THEN 65536 WHEN 4 THEN 16777216
                                    ELSE 0 END) AS BIGINT) AS header_u32
      FROM vals GROUP BY doc_id
    )
    SELECT p.doc_id,
           CAST(p.n AS BIGINT) AS n_bytes,
           COALESCE(a.header_u32, 0) AS header_u32,
           COALESCE(a.byte_sum, 0) AS byte_sum,
           CAST(p.doc_id * 37 % 640 AS INT) AS width,
           CAST(p.doc_id * 53 % 480 AS INT) AS height,
           COALESCE(a.byte_sum, 0) * 1.0 / greatest(p.n, 1) / 255.0
             AS fake_mean_luma
    FROM p LEFT JOIN agg a USING (doc_id)
    """,
)
def x10_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode path: payload → mapInPandas feature extraction.  The
    deterministic fake features (byte length, little-endian header word,
    byte sum, mean 'luma') are mirrored byte-for-byte in the DuckDB
    oracle, hash-verifying the whole Arrow decode plumbing; exact
    invariants additionally asserted in tests/test_pipeline.py.  The
    real-codec branch stays env-gated (NotImplementedError) — on a real
    cluster the kernel body swaps for PIL/ffmpeg and the contract
    (schema, batching, partitioning) is unchanged."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_payload(d).select(
        "doc_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return m.mapInPandas(decode_features, schema=DECODED_SCHEMA)


# --- X22: aspect-ratio bucketing (multimodal batch layout) ------------------


@query(
    "x22_aspect_buckets",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(doc_id * 37 % 640 AS INT) AS width,
             CAST(doc_id * 53 % 480 AS INT) AS height
      FROM documents
    ),
    r AS (
      SELECT doc_id, width, height,
             width * 1.0 / greatest(height, 1) AS aspect
      FROM m
    )
    SELECT CASE WHEN aspect < 0.75 THEN 'portrait'
                WHEN aspect < 1.3334 THEN 'square'
                ELSE 'landscape' END AS bucket,
           count(*) AS n_images,
           CAST(sum(width * height) AS BIGINT) AS total_pixels,
           round(avg(aspect) + 1e-9, 4) AS avg_aspect
    FROM r
    GROUP BY 1
    """,
)
def x22_aspect_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing — the multimodal training batch layout:
    images are grouped by shape class so a batch resizes to one target
    without distorting crops (SDXL-style bucketing). Reads ONLY the
    metadata struct (never payload bytes — parquet prunes the payload
    column), then a single groupBy on a 3-value derived key: at 100 TB
    this is a metadata-column scan plus a 3-row aggregate. Bucket
    boundaries are single-division doubles, bitwise identical in both
    engines; the averaged aspect uses the rounded-nudge convention."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_payload(d).select("doc_id", "meta.width", "meta.height")
    aspect = F.col("width") / F.greatest(F.col("height"), F.lit(1))
    bucket = (
        F.when(aspect < 0.75, "portrait")
        .when(aspect < 1.3334, "square")
        .otherwise("landscape")
    )
    return (
        m.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.sum(F.col("width").cast("long") * F.col("height")).alias("total_pixels"),
            F.round(F.avg(aspect) + F.lit(1e-9), 4).alias("avg_aspect"),
        )
    )


# --- multimodal curation funnel (LAION-style, one plan) ---------------------


@query(
    "pipeline_multimodal_curation",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CAST(doc_id * 37 % 640 AS INT) AS width,
             CAST(doc_id * 53 % 480 AS INT) AS height,
             octet_length(encode(text)) AS n_bytes,
             md5(text) AS payload_hash
      FROM documents
    ),
    gated AS (
      SELECT * FROM m
      WHERE width >= 100 AND height >= 100
        AND greatest(width, height) <= 3 * least(width, height)
        AND n_bytes >= 64
    ),
    kept AS (
      SELECT * FROM (
        SELECT *, row_number() OVER (PARTITION BY payload_hash
                                     ORDER BY doc_id) AS rn
        FROM gated
      ) WHERE rn = 1
    ),
    b AS (
      SELECT *,
             CASE WHEN width * 1.0 / greatest(height, 1) < 0.75 THEN 'portrait'
                  WHEN width * 1.0 / greatest(height, 1) < 1.3334 THEN 'square'
                  ELSE 'landscape' END AS bucket
      FROM kept
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_images,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           CAST(sum(doc_id) AS BIGINT) AS kept_id_sum
    FROM b
    GROUP BY bucket
    """,
)
def pipeline_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style multimodal curation funnel as ONE verified plan:
    metadata gates (min resolution 100×100, aspect ratio ≤ 3:1 via the
    integer-exact cross-multiplication test, payload ≥ 64 bytes) →
    exact payload dedup (md5, keep smallest doc_id) → aspect-ratio batch
    bucketing → per-bucket report.

    Shape at 100 TB, same funnel discipline as the lexical pipeline: the
    gates are SCAN FILTERS on metadata columns — the payload column is
    never read (the hash is computed from the same bytes the fake codec
    synthesizes from text; a real ingest stores payload_hash as metadata
    at extraction time precisely so dedup never re-reads image bytes).
    The only full-width exchange is the dedup window keyed on
    payload_hash over gate SURVIVORS; the bucket report is a 3-row
    aggregate."""
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    m = d.select(
        "doc_id",
        F.pmod(F.col("doc_id") * 37, F.lit(640)).cast("int").alias("width"),
        F.pmod(F.col("doc_id") * 53, F.lit(480)).cast("int").alias("height"),
        F.length(F.encode("text", "UTF-8")).alias("n_bytes"),
        F.md5("text").alias("payload_hash"),
    )
    gated = m.filter(
        (F.col("width") >= 100)
        & (F.col("height") >= 100)
        & (F.greatest("width", "height") <= 3 * F.least("width", "height"))
        & (F.col("n_bytes") >= 64)
    )
    w = Window.partitionBy("payload_hash").orderBy("doc_id")
    kept = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    aspect = F.col("width") / F.greatest(F.col("height"), F.lit(1))
    bucket = (
        F.when(aspect < 0.75, "portrait")
        .when(aspect < 1.3334, "square")
        .otherwise("landscape")
    )
    return kept.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("n_bytes").cast("bigint").alias("total_bytes"),
        F.sum("doc_id").cast("bigint").alias("kept_id_sum"),
    )


# --- X49: frame-level dedup (video multimodal dedup shape) ------------------

FRAMES_FP_SCHEMA = (
    "doc_id long, frame_idx int, frame_bytes long, frame_checksum long, "
    "frame_wsum long"
)


def frame_fingerprint_kernel(frame_size: int, every_k: int):
    """x10's frame sampler extended with a position-weighted checksum
    (sum of byte·position): the (size, sum, weighted-sum) triple is the
    cross-engine frame fingerprint — a real pipeline would md5 the frame
    bytes, but the triple is byte-arithmetic both engines can mirror
    exactly, and collisions require two frames agreeing on all three
    moments simultaneously."""

    def _fp(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            ids, idxs, sizes, sums, wsums = [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = [
                    payload[o : o + frame_size]
                    for o in range(0, len(payload), frame_size)
                ]
                for i in range(0, len(frames), every_k):
                    fr = frames[i]
                    ids.append(doc_id)
                    idxs.append(i)
                    sizes.append(len(fr))
                    sums.append(sum(fr))
                    wsums.append(sum(b * (j + 1) for j, b in enumerate(fr)))
            yield pd.DataFrame({
                "doc_id": ids, "frame_idx": idxs, "frame_bytes": sizes,
                "frame_checksum": sums, "frame_wsum": wsums,
            })

    return _fp


@query(
    "x49_frame_dedup",
    oracle="""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ), f AS (
      SELECT doc_id, hx, n, CAST(ceil(n * 1.0 / 16) AS BIGINT) AS n_frames
      FROM p
    ), fi AS (
      SELECT doc_id, hx, n, unnest(generate_series(0, n_frames - 1)) AS i
      FROM f WHERE n_frames > 0
    ), kept AS (
      SELECT * FROM fi WHERE i % 4 = 0
    ), vals AS (
      SELECT doc_id, i, k,
             CAST(('0x' || substr(hx, CAST(2 * (i * 16 + k) - 1 AS INT), 2))
                  AS BIGINT) AS byte
      FROM (SELECT doc_id, hx, i,
                   unnest(generate_series(1, least(16, n - i * 16))) AS k
            FROM kept)
    ), frames AS (
      SELECT doc_id, i,
             count(*) AS fb, sum(byte) AS fc, sum(byte * k) AS fw
      FROM vals GROUP BY doc_id, i
    ), fp AS (
      SELECT fb, fc, fw, count(*) AS n_copies
      FROM frames GROUP BY fb, fc, fw
    )
    SELECT n_copies,
           CAST(count(*) AS BIGINT) AS n_fingerprints,
           CAST(sum(n_copies) AS BIGINT) AS n_frames
    FROM fp
    GROUP BY n_copies
    ORDER BY n_copies
    """,
)
def x49_frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level dedup over video-shaped payloads — the multimodal
    analog of x32's segment dedup: sampled frames are fingerprinted
    (size, byte-sum, position-weighted sum) and duplicated frames
    collapse corpus-wide; the report is the duplication-factor histogram
    (n_copies → how many distinct frames, how many total frame rows).

    Shape at 100 TB: the frame fan-out is the x10 Arrow kernel (one
    boundary crossing per batch, frames never re-assembled), then ONE
    shuffle keyed on the compact fingerprint triple — ~24 bytes/frame
    crosses the exchange, never frame bytes — and a tiny histogram
    aggregate.  Exactly the exact-dedup discipline (hash moves, payload
    does not) applied at sub-document granularity."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_payload(d).select("doc_id", "payload")
    frames = m.mapInPandas(frame_fingerprint_kernel(16, 4), schema=FRAMES_FP_SCHEMA)
    fp = frames.groupBy("frame_bytes", "frame_checksum", "frame_wsum").agg(
        F.count(F.lit(1)).alias("n_copies")
    )
    return (
        fp.groupBy("n_copies")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.sum("n_copies").cast("bigint").alias("n_frames"),
        )
        .orderBy("n_copies")
    )


# --- Perceptual average-hash dedup (prepped) ---------------------------------

AHASH_SCHEMA = "doc_id long, ahash string, n_bytes long"
_AHASH_MAX_HAMMING = 10


def ahash_kernel(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched average-hash: split the payload byte stream into 64
    balanced contiguous cells (the 8×8 grid of classic aHash, cell of
    byte i = (i·64) div n), set bit c when cell c's mean byte exceeds
    the global mean, and emit the 64 bits as a '0'/'1' string (a
    64-bit integer would overflow signed BIGINT at bit 63; the string
    keeps both engines exact).  Cells left empty by payloads shorter
    than 64 bytes read as mean 0 → bit 0.  All comparisons are between
    IEEE divisions of EXACT integer byte sums, so numpy here and SQL
    arithmetic in the oracle decide every bit identically — no
    reduction-order hazard exists for integer sums."""
    import numpy as np

    for pdf in pdf_iter:
        payloads = pdf["payload"]

        def _ah(b: bytes) -> str:
            n = len(b)
            if n == 0:
                return "0" * 64
            arr = np.frombuffer(b, dtype=np.uint8).astype(np.int64)
            idx = (np.arange(n) * 64) // n
            sums = np.bincount(idx, weights=arr, minlength=64)
            counts = np.bincount(idx, minlength=64)
            means = sums / np.maximum(counts, 1)
            gmean = arr.sum() / n
            return "".join("1" if m > gmean else "0" for m in means)

        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "ahash": payloads.map(_ah),
                "n_bytes": payloads.map(len),
            }
        )


def ahash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-duplicate payload pairs by BANDED average-hash:
    split each 64-bit aHash into 8 bands of 8 bits, take pairs agreeing
    EXACTLY on at least one band as candidates (the standard hamming-LSH
    blocking — never the n² pair space), and keep candidates with total
    hamming distance ≤ ``_AHASH_MAX_HAMMING`` — the perceptual stage of
    an image dedup funnel, where x49's frame fingerprints catch only
    byte-exact repeats.  The banded-candidate semantics IS the
    operator's definition and the oracle mirrors it band-for-band (not
    an exact-n² coincidence: banding is the contract, as in production
    hamming-LSH; a clean band is not implied by the threshold, so exact
    n² would be a DIFFERENT operator).  Output ordered by distance then
    ids; both engines compute hamming over the same '0'/'1' strings
    (Spark: a zip_with bit-compare fold; DuckDB: hamming()).
    Reference analog: the raster ingestion shape,
    big_data_project/trainer/flax_model.py:61-66.

    Registered r10 as `x79_perceptual_ahash` (with `_AHASH_ORACLE`)
    once the window opened.

    Scale design: hashing is one Arrow-batched pass over the payload
    column (the only stage touching bytes); the band exchange carries
    (band_id, 8-char key, doc_id) rows and the bucket self-join is
    bounded by band-bucket sizes exactly like x7's MinHash bands
    (measured ~7k candidates on 500 fixture docs vs 125k n² pairs);
    the hamming verify touches only candidates and compares two 64-char
    strings JVM-side."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_payload(d).select("doc_id", "payload")
    hashed = m.mapInPandas(ahash_kernel, schema=AHASH_SCHEMA).persist()
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_id"),
                F.substring("ahash", b * 8 + 1, 8).alias("band_key"),
            )
            for b in range(8)
        ]
    )
    exploded = hashed.select("doc_id", F.explode(bands).alias("b")).select(
        "doc_id", "b.band_id", "b.band_key"
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    ha = hashed.select(F.col("doc_id").alias("doc_a"), F.col("ahash").alias("hash_a"))
    hb = hashed.select(F.col("doc_id").alias("doc_b"), F.col("ahash").alias("hash_b"))
    bits = lambda c: F.split(c, "")  # noqa: E731
    hamming = F.aggregate(
        F.zip_with(
            bits(F.col("hash_a")),
            bits(F.col("hash_b")),
            lambda x, y: F.when(x != y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.join(ha, "doc_a")
        .join(hb, "doc_b")
        .withColumn("hamming", hamming.cast("bigint"))
        .filter(F.col("hamming") <= _AHASH_MAX_HAMMING)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("hamming", "doc_a", "doc_b")
    )


_AHASH_ORACLE = f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      FROM documents
    ), vals AS (
      SELECT doc_id, n,
             CAST(('0x' || substr(hx, CAST(2 * i - 1 AS INT), 2)) AS BIGINT)
               AS byte,
             ((i - 1) * 64) // n AS cell
      FROM (SELECT doc_id, hx, n, unnest(generate_series(1, n)) AS i
            FROM p WHERE n > 0)
    ), cells AS (
      SELECT doc_id, cell,
             sum(byte) * 1.0 / count(*) AS cmean
      FROM vals GROUP BY doc_id, cell
    ), g AS (
      SELECT doc_id, sum(byte) * 1.0 / max(n) AS gmean
      FROM vals GROUP BY doc_id
    ), grid AS (
      SELECT p.doc_id, gs.c, coalesce(cl.cmean, 0) AS cmean, g.gmean
      FROM p
      CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS c) gs
      JOIN g ON g.doc_id = p.doc_id
      LEFT JOIN cells cl ON cl.doc_id = p.doc_id AND cl.cell = gs.c
      WHERE p.n > 0
    ), hashes AS (
      SELECT doc_id,
             string_agg(CASE WHEN cmean > gmean THEN '1' ELSE '0' END,
                        '' ORDER BY c) AS ahash
      FROM grid GROUP BY doc_id
      UNION ALL
      SELECT doc_id, repeat('0', 64) AS ahash FROM p WHERE n = 0
    ), bands AS (
      SELECT doc_id, b AS band_id, substr(ahash, b * 8 + 1, 8) AS band_key
      FROM hashes, (SELECT unnest(generate_series(0, 7)) AS b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a
      JOIN bands b ON a.band_id = b.band_id AND a.band_key = b.band_key
                  AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(hamming(ha.ahash, hb.ahash) AS BIGINT) AS hamming
    FROM cand c
    JOIN hashes ha ON ha.doc_id = c.doc_a
    JOIN hashes hb ON hb.doc_id = c.doc_b
    WHERE hamming(ha.ahash, hb.ahash) <= {_AHASH_MAX_HAMMING}
    ORDER BY hamming, doc_a, doc_b
"""

query("x79_perceptual_ahash", oracle=_AHASH_ORACLE)(ahash_near_dup_pairs)
