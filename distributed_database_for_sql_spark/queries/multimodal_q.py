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
    "multimodal_image_features",
    # The synthetic pixel pattern is pure integer arithmetic of
    # (doc_id, x, y, c) — pixel = (doc_id*7 + y*31 + x*5 + c*11) % 256,
    # dims w = 8 + id%9, h = 6 + id%5 (sources/multimodal.synthetic_pixels)
    # — so DuckDB recomputes every channel sum without decoding anything.
    # Spark, by contrast, round-trips the pixels through a REAL encoded
    # BMP file (stride padding, bottom-up rows, BGR order): the hash match
    # proves the decoder inverts the format exactly — a wrong channel
    # order or stride handling scrambles the per-channel means.
    oracle="""
    WITH dims AS (
      SELECT doc_id, 8 + doc_id % 9 AS w, 6 + doc_id % 5 AS h
      FROM documents
    ), px AS (
      SELECT doc_id, w, h, c,
             (doc_id * 7 + y * 31 + x * 5 + c * 11) % 256 AS v
      FROM dims,
           UNNEST(generate_series(0, w - 1)) AS tx(x),
           UNNEST(generate_series(0, h - 1)) AS ty(y),
           UNNEST([0, 1, 2]) AS tc(c)
    )
    SELECT doc_id,
           CAST(MAX(w) AS INT) AS width,
           CAST(MAX(h) AS INT) AS height,
           3 AS channels,
           CAST(SUM(CASE WHEN c = 0 THEN v END) * 1000
                // (MAX(w) * MAX(h)) AS BIGINT) AS mean_r_milli,
           CAST(SUM(CASE WHEN c = 1 THEN v END) * 1000
                // (MAX(w) * MAX(h)) AS BIGINT) AS mean_g_milli,
           CAST(SUM(CASE WHEN c = 2 THEN v END) * 1000
                // (MAX(w) * MAX(h)) AS BIGINT) AS mean_b_milli
    FROM px
    GROUP BY doc_id
    ORDER BY doc_id
    """,
    tags=("multimodal", "image", "udf", "features", "llm"),
)
def multimodal_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-modality decode + feature extraction with a REAL codec path:
    per-doc synthetic pixels → encoded 24-bit BMP payload (mapInPandas) →
    parsed back by the pure-numpy BMP decoder → integer channel means.
    Completes the multimodal claim left stubbed in round 4 — the decode
    leaf now actually decodes (sources/multimodal.decode_bmp)."""
    from ..sources.multimodal import attach_bmp_payload, extract_image_features

    docs = load_table(spark, sf_dir, "documents")
    media = attach_bmp_payload(docs)
    return (extract_image_features(media)
            .select("doc_id", "width", "height", "channels",
                    "mean_r_milli", "mean_g_milli", "mean_b_milli")
            .orderBy("doc_id"))


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
    # The fake decode is plain arithmetic on the first 8 payload bytes
    # (big-endian uint64 h: width = 64 + h % 1024, height = 64 +
    # (h >> 10) % 1024), so DuckDB recomputes it from hex(payload):
    # only bytes 5-7 (bits 0-23) can affect the two moduli.
    oracle="""
    WITH h AS (
      SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             rpad(substr(hex(encode(text)), 1, 16), 16, '0') AS h16
      FROM documents
    ), b AS (
      SELECT doc_id, n_bytes,
             CAST(('0x' || substr(h16, 11, 2)) AS BIGINT) AS b5,
             CAST(('0x' || substr(h16, 13, 2)) AS BIGINT) AS b6,
             CAST(('0x' || substr(h16, 15, 2)) AS BIGINT) AS b7
      FROM h
    )
    SELECT doc_id, n_bytes,
           CAST(64 + (b6 * 256 + b7) % 1024 AS INT) AS width,
           CAST(64 + ((b5 * 65536 + b6 * 256 + b7) // 1024) % 1024 AS INT)
             AS height,
           3 AS channels, TRUE AS decode_ok
    FROM b ORDER BY doc_id
    """,
    tags=("multimodal", "udf", "llm"),
)
def multimodal_image_meta_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas 'decode' → (width, height, channels) via the
    deterministic stub; tests additionally verify the values against the
    same pure-Python function on collected payloads."""
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
    # The numpy kernel is byte arithmetic: per-payload mean / population
    # std / 4-bin histogram (np.histogram edges [0,64,128,192,256]) —
    # DuckDB recomputes it by exploding hex(payload) into bytes.
    # Output shape (changed after the r3 driver run): the histogram is
    # flattened to four scalar columns (the driver's canonicalizer cannot
    # hash list-typed cells), and mean/std are floor-quantized to BIGINT
    # (mean is an exact integer-sum/count so it is bitwise identical across
    # engines; std uses different summation algorithms, so quantizing at
    # 1e-3 absorbs the ~1e-14 relative jitter).
    oracle="""
    WITH bytes AS (
      SELECT doc_id,
             CAST(('0x' || substr(hex(encode(text)), 2 * i + 1, 2)) AS INT)
               AS b
      FROM documents,
           UNNEST(generate_series(0, octet_length(encode(text)) - 1)) AS t(i)
    ), agg AS (
      SELECT doc_id,
             CAST(FLOOR(AVG(b) * 1000000 + 0.5) AS BIGINT) AS mean_byte_ppm,
             CAST(FLOOR(COALESCE(stddev_pop(b), 0) * 1000 + 0.5) AS BIGINT)
               AS std_byte_milli,
             CAST(COUNT(*) FILTER (WHERE b < 64) AS BIGINT)               AS hist_b0,
             CAST(COUNT(*) FILTER (WHERE b >= 64 AND b < 128) AS BIGINT)  AS hist_b1,
             CAST(COUNT(*) FILTER (WHERE b >= 128 AND b < 192) AS BIGINT) AS hist_b2,
             CAST(COUNT(*) FILTER (WHERE b >= 192) AS BIGINT)             AS hist_b3
      FROM bytes GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes,
           COALESCE(a.mean_byte_ppm, 0)  AS mean_byte_ppm,
           COALESCE(a.std_byte_milli, 0) AS std_byte_milli,
           COALESCE(a.hist_b0, 0) AS hist_b0,
           COALESCE(a.hist_b1, 0) AS hist_b1,
           COALESCE(a.hist_b2, 0) AS hist_b2,
           COALESCE(a.hist_b3, 0) AS hist_b3
    FROM documents d LEFT JOIN agg a USING (doc_id)
    ORDER BY doc_id
    """,
    tags=("multimodal", "udf", "features", "llm"),
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-level feature vectors (mean/std/4-bin histogram) per payload
    via mapInPandas — the embedding-model stand-in of the training
    pipeline; tests/test_llm.py additionally verifies values vs numpy.
    The driver-facing projection flattens the histogram array into scalar
    columns and quantizes the float stats (see oracle comment)."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    from ..sources.multimodal import extract_features

    feats = extract_features(media, n_bins=4)
    return feats.select(
        "doc_id", "n_bytes",
        F.floor(F.col("mean_byte") * 1000000 + F.lit(0.5)).cast("bigint")
         .alias("mean_byte_ppm"),
        F.floor(F.col("std_byte") * 1000 + F.lit(0.5)).cast("bigint")
         .alias("std_byte_milli"),
        F.element_at("byte_hist", 1).cast("bigint").alias("hist_b0"),
        F.element_at("byte_hist", 2).cast("bigint").alias("hist_b1"),
        F.element_at("byte_hist", 3).cast("bigint").alias("hist_b2"),
        F.element_at("byte_hist", 4).cast("bigint").alias("hist_b3"),
    ).orderBy("doc_id")


@register(
    "multimodal_audio_features",
    # The audio kernel is pure integer arithmetic on uint16-LE frames
    # re-centered at 16384 (sources/multimodal.extract_audio_features),
    # so DuckDB recomputes it from hex(payload): bytes 2i/2i+1 form
    # sample i, flips are counted over the ordered nonzero sign stream.
    oracle="""
    WITH s AS (
      SELECT doc_id, i,
             CAST(('0x' || substr(hex(encode(text)), 4 * i + 1, 2)) AS BIGINT)
             + 256 * CAST(('0x' || substr(hex(encode(text)), 4 * i + 3, 2))
                          AS BIGINT)
             - 16384 AS smp
      FROM documents,
           UNNEST(generate_series(0, octet_length(encode(text)) // 2 - 1))
             AS t(i)
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_samples,
             MAX(ABS(smp)) AS max_abs,
             CAST(SUM(ABS(smp)) * 1000 // COUNT(*) AS BIGINT)
               AS mean_abs_milli
      FROM s GROUP BY doc_id
    ), flips AS (
      SELECT doc_id, COUNT(*) AS n_sign_flips FROM (
        SELECT doc_id, SIGN(smp) AS g,
               LAG(SIGN(smp)) OVER (PARTITION BY doc_id ORDER BY i) AS pg
        FROM s WHERE smp <> 0
      ) WHERE pg IS NOT NULL AND g <> pg
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           COALESCE(a.n_samples, 0)      AS n_samples,
           COALESCE(a.max_abs, 0)        AS max_abs,
           COALESCE(a.mean_abs_milli, 0) AS mean_abs_milli,
           COALESCE(f.n_sign_flips, 0)   AS n_sign_flips
    FROM documents d
    LEFT JOIN agg a ON d.doc_id = a.doc_id
    LEFT JOIN flips f ON d.doc_id = f.doc_id
    ORDER BY d.doc_id
    """,
    tags=("multimodal", "audio", "udf", "features", "llm"),
)
def multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-modality feature extraction: payload as 16-bit PCM →
    amplitude stats (peak, mean-abs in milli-units, sign flips — the
    zero-crossing loudness/VAD features) via the same mapInPandas
    plumbing a real audio decoder would use.  All-integer outputs keep
    the cross-engine hash exact."""
    docs = load_table(spark, sf_dir, "documents")
    media = attach_binary_payload(docs)
    from ..sources.multimodal import extract_audio_features

    return (extract_audio_features(media)
            .select("doc_id", "n_samples", "max_abs", "mean_abs_milli",
                    "n_sign_flips")
            .orderBy("doc_id"))
