"""Multimodal-column queries through the driver contract.

The binary payload is derived deterministically from documents.text (see
sources/multimodal.py), so DuckDB can oracle the Spark-side plumbing:
byte lengths, hashes, frame slicing, and the deterministic fake-decode
metadata all recompute exactly in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..sources.multimodal import attach_binary_payload, extract_image_meta, sample_frames
from .base import register


@register(
    "multimodal_payload_meta",
    oracle="""
    SELECT doc_id, 'image' AS modality,
           octet_length(text::BLOB) AS n_bytes,
           md5(text) AS content_md5
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "llm"),
)
def multimodal_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload column + typed metadata (modality, size, hash)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return media.select("doc_id", "modality", "n_bytes", "content_md5").orderBy("doc_id")


@register(
    "multimodal_image_meta_udf",
    oracle=None,  # Pandas-UDF path; deterministic fake-decode pinned by pytest
    tags=("multimodal", "udf", "llm"),
)
def multimodal_image_meta_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas 'decode' → (width, height, channels) via the
    deterministic stub.  Rows-only driver check; tests verify the values
    against the same pure-Python function on collected payloads."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    return extract_image_meta(media).orderBy("doc_id")


@register(
    "multimodal_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id, octet_length(text::BLOB) AS nb,
             unnest(generate_series(0,
               LEAST(3, (octet_length(text::BLOB) + 255) // 256 - 1))) AS frame_idx
      FROM documents
    )
    SELECT doc_id, frame_idx,
           CASE WHEN (frame_idx + 1) * 256 <= nb THEN 256
                ELSE nb - frame_idx * 256 END AS frame_len
    FROM f
    ORDER BY doc_id, frame_idx
    """,
    tags=("multimodal", "udf", "llm"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (≤4 × 256-byte chunks per payload) via mapInPandas;
    the oracle recomputes chunk boundaries arithmetically."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    frames = sample_frames(media, frame_size=256, max_frames=4)
    return frames.select(
        "doc_id", "frame_idx", F.col("frame_len").cast("long").alias("frame_len")
    ).orderBy("doc_id", "frame_idx")


@register(
    "multimodal_resize",
    oracle="""
    SELECT doc_id, 32 AS out_w, 32 AS out_h,
           CAST(32 * 32 * 3 AS BIGINT) AS resized_len
    FROM documents
    ORDER BY doc_id
    """,
    tags=("multimodal", "udf", "resize", "llm"),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic nearest-neighbor 'resize' to 32x32x3 byte buffers via
    mapInPandas; every output row is uniform-size, ready for training
    shards.  The oracle pins the shape columns; the resampled byte
    content is pinned by tests/test_llm.py against the same pure-Python
    kernel on collected payloads."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    from ..sources.multimodal import resize_images

    resized = resize_images(media, 32, 32, 3)
    return resized.select("doc_id", "out_w", "out_h", "resized_len").orderBy("doc_id")


@register(
    "multimodal_feature_extract",
    oracle=None,  # numpy kernel; values pinned by pytest vs the same
    # pure-Python computation on collected payloads
    tags=("multimodal", "udf", "features", "llm"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature vectors (mean/std/4-bin histogram) per payload
    via mapInPandas — the embedding-model stand-in of the training
    pipeline.  Rows-only driver check; tests/test_llm.py verifies values."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    from ..sources.multimodal import extract_features

    feats = extract_features(media, n_bins=4)
    return feats.select(
        "doc_id", "n_bytes",
        F.round("mean_byte", 6).alias("mean_byte"),
        F.round("std_byte", 6).alias("std_byte"),
        "byte_hist",
    ).orderBy("doc_id")
