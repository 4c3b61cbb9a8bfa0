"""Multimodal-plumbing queries (north-star): binary payloads are
synthesized from document text (utf-8 bytes), so the mapInPandas
decode path is exercised for real while DuckDB oracles recompute the
same metadata from the text characters (ascii == utf-8 byte here)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osarchiver_spark.operators.multimodal import (
    attach_binary,
    audio_features,
    extract_metadata,
    resize_thumbs,
    sample_frames,
)
from osarchiver_spark.sources.parquet import load_table

FRAME_STRIDE = 16


def q_multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_metadata(attach_binary(docs, "doc_id", "text"))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered with ``frames`` flattened to a CSV string: the
    driver's order-insensitive canonicalizer sorts/factorizes every
    column, which requires hashable scalars — an ``array<int>`` column
    is unhashable in pandas and errored in round 2. The array-typed
    operator (``sample_frames``) stays for programmatic use."""
    docs = load_table(spark, sf_dir, "documents")
    sampled = sample_frames(attach_binary(docs, "doc_id", "text"), stride=FRAME_STRIDE)
    return sampled.select(
        "doc_id",
        "n_frames",
        F.array_join(F.col("frames").cast("array<string>"), ",").alias("frames"),
    )


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resize verb of the multimodal surface: aspect-preserving
    fit into a 64px box over the binary column, thumbnails emitted as
    bytes (hashed to a hex string here so every output column is
    canonicalizer-sortable). The Arrow batch shape — binary in,
    binary out, typed dims — is the real plumbing a PIL-backed
    resize drops into (operators/multimodal.py::resize_image is the
    fenced codec hook)."""
    docs = load_table(spark, sf_dir, "documents")
    t = resize_thumbs(attach_binary(docs, "doc_id", "text"), max_dim=64)
    return t.select(
        "doc_id", "src_w", "src_h", "dst_w", "dst_h",
        F.length("thumb").cast("int").alias("thumb_len"),
        F.md5("thumb").alias("thumb_md5"),
    )


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feature-extract verb of the multimodal surface: per-window
    RMS energy over the (fake-decoded) PCM stream. Window sums are
    integer-exact, so the oracle recomputes identical features from
    the source characters."""
    docs = load_table(spark, sf_dir, "documents")
    return audio_features(attach_binary(docs, "doc_id", "text"))


QUERIES = {
    "audio_features": q_audio_features,
    "multimodal_metadata": q_multimodal_metadata,
    "frame_sample": q_frame_sample,
    "image_resize": q_image_resize,
}

ORACLES = {
    "multimodal_metadata": """
        WITH m AS (
            SELECT doc_id, length(text) AS byte_len,
                   ascii(substr(text, 1, 1)) * 16777216
                   + ascii(substr(text, 2, 1)) * 65536
                   + ascii(substr(text, 3, 1)) * 256
                   + ascii(substr(text, 4, 1)) AS magic
            FROM documents)
        SELECT doc_id,
               CAST(byte_len AS INT) AS byte_len,
               CAST(magic AS BIGINT) AS magic_int,
               CAST(64 + magic % 960 AS INT) AS fake_width,
               CAST(64 + (magic // 256) % 960 AS INT) AS fake_height
        FROM m
    """,
    "frame_sample": f"""
        WITH f AS (
            SELECT doc_id,
                   [ascii(substr(text, i, 1))
                    for i in range(1, length(text) + 1)
                    if (i - 1) % {FRAME_STRIDE} = 0] AS frames
            FROM documents)
        SELECT doc_id, CAST(len(frames) AS INT) AS n_frames,
               coalesce(array_to_string(frames, ','), '') AS frames
        FROM f
    """,
}

ORACLES["image_resize"] = """
    WITH m AS (
        SELECT doc_id, text, length(text) AS blen,
               ascii(substr(text, 1, 1)) * 16777216
               + ascii(substr(text, 2, 1)) * 65536
               + ascii(substr(text, 3, 1)) * 256
               + ascii(substr(text, 4, 1)) AS magic
        FROM documents),
    d AS (
        SELECT doc_id, text, blen,
               CAST(64 + magic % 960 AS INT) AS src_w,
               CAST(64 + (magic // 256) % 960 AS INT) AS src_h
        FROM m)
    SELECT doc_id, src_w, src_h,
           CAST(greatest(1, floor(src_w * 64.0 / greatest(src_w, src_h))) AS INT) AS dst_w,
           CAST(greatest(1, floor(src_h * 64.0 / greatest(src_w, src_h))) AS INT) AS dst_h,
           CAST(least(blen, greatest(1, floor(src_w * 64.0 / greatest(src_w, src_h)))) AS INT)
               AS thumb_len,
           md5(substr(text, 1,
               CAST(greatest(1, floor(src_w * 64.0 / greatest(src_w, src_h))) AS INT)))
               AS thumb_md5
    FROM d
"""

ORACLES["audio_features"] = """
    WITH samples AS (
        SELECT doc_id,
               CAST((t.i - 1) // 256 AS INT) AS window_idx,
               ascii(substr(text, CAST(t.i AS INT), 1)) - 128 AS x
        FROM documents, LATERAL (SELECT unnest(range(1, length(text) + 1)) AS i) t)
    SELECT doc_id, window_idx,
           CAST(count(*) AS INT) AS n_samples,
           round(sqrt(sum(x * x) / count(*)), 4) AS rms
    FROM samples GROUP BY doc_id, window_idx
"""
