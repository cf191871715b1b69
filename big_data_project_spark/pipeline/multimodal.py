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
    PIL/ffmpeg kernel would use."""
    if use_real_codec:
        raise NotImplementedError(
            "image/audio codecs are not installed in this environment; "
            "plug PIL.Image.open / torchaudio.load here on a real cluster"
        )
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


@query("x10_multimodal_decode", oracle=None)
def x10_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode path: payload → mapInPandas feature extraction.
    Deterministic fake features (stubbed codec) → rows-only check plus
    exact invariants in tests/test_pipeline.py."""
    d = load_table(spark, sf_dir, "documents")
    m = attach_payload(d).select(
        "doc_id", "payload", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return m.mapInPandas(decode_features, schema=DECODED_SCHEMA)
