"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference extension (task brief): treat image/audio/video as opaque
``binary`` columns with typed metadata, with decode / feature-extract /
resize / frame-sample as Arrow-batched ``mapInPandas`` stages.

No image/audio libraries exist in this container, so the actual codec step
is STUBBED: ``decode_image_batch`` raises ``NotImplementedError`` when asked
for a real decode and otherwise produces a deterministic fake derived from
the payload bytes. Everything Spark-side — schema, batch shape, partition
behavior, UDF signature — is real and tested; swapping in Pillow/librosa
later only changes the inside of the pandas function.

Scale posture: binary payloads ride in parquet (dictionary-encoded metadata
columns, payload pages compressed); ``mapInPandas`` streams Arrow batches so
a partition never fully materializes in Python; partitioning is by doc — no
shuffle at all in the decode/feature path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from e_commerce_data_warehouse_recommendation_system_spark.registry import component, register
from e_commerce_data_warehouse_recommendation_system_spark.sources.readers import prepare

#: Output schema of the decode/feature stage — the typed-metadata contract.
DECODE_SCHEMA = (
    "doc_id long, byte_len long, fake_width int, fake_height int, n_patches long"
)

PATCH = 16  # fake ViT-style patch size used by the deterministic stub


def media_frame(spark: SparkSession) -> DataFrame:
    """Documents re-cast as a multimodal table: (doc_id, payload binary,
    media_type, byte metadata). Stands in for an image/audio parquet whose
    payload column is real media bytes."""
    d = spark.table("documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_image_batch(batches: Iterator[pd.DataFrame], real_decode: bool = False) -> Iterator[pd.DataFrame]:
    """The mapInPandas decode/feature stage (Arrow-batched).

    ``real_decode=True`` is the seam for an actual codec (Pillow etc.) —
    unavailable in this container, so it raises. The deterministic fake
    derives plausible dimensions from payload length: width/height are a
    stable function of byte_len, patches = ceil(w/P)*ceil(h/P).
    """
    for pdf in batches:
        if real_decode:
            raise NotImplementedError(
                "real image decode requires an imaging library not present in "
                "this environment; the deterministic fake covers the plumbing"
            )
        byte_len = pdf["payload"].map(len)
        fake_width = (byte_len % 640 + 32).astype("int32")
        fake_height = ((byte_len * 7) % 480 + 32).astype("int32")
        n_patches = (
            ((fake_width + PATCH - 1) // PATCH) * ((fake_height + PATCH - 1) // PATCH)
        ).astype("int64")
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": byte_len.astype("int64"),
                "fake_width": fake_width,
                "fake_height": fake_height,
                "n_patches": n_patches,
            }
        )


@register(
    "mm_decode_features",
    oracle=f"""
    SELECT doc_id,
           octet_length(encode(text)) AS byte_len,
           CAST(octet_length(encode(text)) % 640 + 32 AS INT) AS fake_width,
           CAST((octet_length(encode(text)) * 7) % 480 + 32 AS INT) AS fake_height,
           CAST(((octet_length(encode(text)) % 640 + 32 + {PATCH - 1}) // {PATCH})
              * (((octet_length(encode(text)) * 7) % 480 + 32 + {PATCH - 1}) // {PATCH}) AS BIGINT) AS n_patches
    FROM documents
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode + feature extraction through mapInPandas. The stubbed
    codec is deterministic arithmetic on byte length, so even this Python
    stage is oracle-checked end-to-end (schema, Arrow batching, and the
    Python boundary all verified against pure SQL)."""
    prepare(spark, sf_dir)
    return media_frame(spark).mapInPandas(decode_image_batch, schema=DECODE_SCHEMA)


FRAME_BYTES = 1000  # fake codec: one "frame" per kB of payload
FRAME_STRIDE = 5  # keep every 5th frame


@component(
    "mm_frame_sample",
    cols=[("doc_id", "num"), ("frame_idx", "num"), ("byte_offset", "num")],
    oracle=f"""
    SELECT doc_id,
           CAST(unnest(range(0, octet_length(encode(text)) // {FRAME_BYTES} + 1, {FRAME_STRIDE}))
                AS INT) AS frame_idx,
           CAST(unnest(range(0, octet_length(encode(text)) // {FRAME_BYTES} + 1, {FRAME_STRIDE}))
                * {FRAME_BYTES} AS BIGINT) AS byte_offset
    FROM documents
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: payload -> deterministic frame count
    (1/kB) -> every-5th frame index exploded to one row per sampled frame
    with its byte offset (what a real pipeline hands to the decoder). The
    explode is map-side — one video with 10^6 frames becomes rows without
    any shuffle, and the downstream decode (mapInPandas, see
    ``decode_image_batch``) sees bounded Arrow batches."""
    prepare(spark, sf_dir)
    m = media_frame(spark)
    n_frames = (F.length(F.col("payload")) / FRAME_BYTES).cast("int") + 1
    idx = F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(FRAME_STRIDE)))
    return m.select("doc_id", idx.alias("frame_idx")).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        (F.col("frame_idx") * FRAME_BYTES).cast("bigint").alias("byte_offset"),
    )


RESIZE_TARGET = 224  # fake resize: longest edge scaled to 224 (ViT input)


@component(
    "mm_resize_sample",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             octet_length(encode(text)) AS byte_len,
             octet_length(encode(text)) % 640 + 32 AS w,
             (octet_length(encode(text)) * 7) % 480 + 32 AS h,
             ((octet_length(encode(text)) % 640 + 32 + {PATCH - 1}) // {PATCH})
               * (((octet_length(encode(text)) * 7) % 480 + 32 + {PATCH - 1}) // {PATCH}) AS np
      FROM documents
    )
    SELECT doc_id, byte_len,
           CAST(FLOOR(w * ({RESIZE_TARGET}.0 / GREATEST(w, h))) AS INT) AS resized_width,
           CAST(FLOOR(h * ({RESIZE_TARGET}.0 / GREATEST(w, h))) AS INT) AS resized_height,
           CAST(np // 4 + 1 AS BIGINT) AS sampled_patches
    FROM d
    """,
    cols=[
        ("doc_id", "num"),
        ("byte_len", "num"),
        ("resized_width", "num"),
        ("resized_height", "num"),
        ("sampled_patches", "num"),
    ],
)
def mm_resize_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained media ops: decode -> 'resize' (dimension arithmetic) ->
    frame/patch sampling (deterministic every-kth). Demonstrates multi-stage
    media pipelines staying inside one mapInPandas-per-stage pattern; the
    resize arithmetic is deterministic (scale = 224/longest-edge, truncate),
    so the whole two-stage Arrow pipeline is oracle-checked in SQL."""
    prepare(spark, sf_dir)
    decoded = media_frame(spark).mapInPandas(decode_image_batch, schema=DECODE_SCHEMA)

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            scale = float(RESIZE_TARGET) / pdf[["fake_width", "fake_height"]].max(axis=1)
            out = pdf[["doc_id", "byte_len"]].copy()
            out["resized_width"] = (pdf["fake_width"] * scale).astype("int32")
            out["resized_height"] = (pdf["fake_height"] * scale).astype("int32")
            out["sampled_patches"] = (pdf["n_patches"] // 4 + 1).astype("int64")
            yield out

    return decoded.mapInPandas(
        resize,
        schema="doc_id long, byte_len long, resized_width int, resized_height int, sampled_patches long",
    )
