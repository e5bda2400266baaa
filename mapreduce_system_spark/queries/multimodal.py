"""Registered multimodal-column queries.

``mm_blob_features`` has a full oracle (byte length + md5 are computable
in DuckDB over the same utf-8 bytes). The decode/frame ops use the
deterministic stand-in decoder (codec libs absent here — see
operators/multimodal.py) → rows-only checks + pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.operators import multimodal as MM
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# coalesce mirrors binarize_text: a NULL text becomes an EMPTY blob on the
# Spark side (n_bytes=0, md5 of ""), so the oracle must encode '' too —
# octet_length(encode(NULL))/md5(NULL) would emit NULLs and hash-diverge.
_BLOB_SQL = """
SELECT doc_id AS id,
       octet_length(encode(coalesce(text, ''))) AS n_bytes,
       md5(coalesce(text, '')) AS md5
FROM documents
ORDER BY id
"""


@register("mm_blob_features", _BLOB_SQL)
def q_blob_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text → blob + metadata → Arrow-batched
    mapInPandas feature extraction (n_bytes, md5)."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    blobs = MM.binarize_text(docs)
    return MM.blob_features(blobs).orderBy("id")


@register("mm_image_features")  # stand-in decoder → rows-only
def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode plumbing over blob columns (deterministic stand-in
    decoder; real codec drops in without engine changes)."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    blobs = MM.binarize_text(docs)
    out = MM.extract_image_features(blobs)
    return out.select(
        "id", "width", "height", F.round("mean_value", 6).alias("mean_value"), "decoder"
    ).orderBy("id")


@register("mm_resize_grid")  # stand-in decoder → rows-only
def q_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid resize plumbing: every row yields an 8×8 pixel buffer."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = MM.resize_image(MM.binarize_text(docs), width=8, height=8)
    return out.select(
        "id", "width", "height", F.octet_length("pixels").alias("n_px"), "decoder"
    ).orderBy("id")


@register("mm_audio_features")  # stand-in decoder → rows-only
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature plumbing: PCM-interpreted blobs → duration + RMS."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = MM.extract_audio_features(MM.binarize_text(docs))
    return out.select(
        "id",
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        "decoder",
    ).orderBy("id")


@register("mm_frame_sample_counts")  # frame blobs → rows-only
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling dataflow (1→N mapInPandas): frames per blob +
    total sampled bytes."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    frames = MM.sample_frames(MM.binarize_text(docs), n_frames=4)
    return (
        frames.groupBy("id")
        .agg(
            F.count("*").alias("n_frames"),
            F.sum(F.octet_length("frame")).alias("sampled_bytes"),
        )
        .orderBy("id")
    )
