"""Registered multimodal-column queries — all hash-checked.

The stand-in codecs are DETERMINISTIC byte-level transforms (codec libs
are absent here — see operators/multimodal.py), which makes them fully
re-computable in SQL: DuckDB extracts the blob's bytes from its hex
encoding and replays the same arithmetic (mean byte, mean-pooled resize,
PCM RMS, evenly-spaced frame spans). Every float in play is an exact
integer sum divided once, so cross-engine values agree bit-for-bit before
rounding. When a real codec is injected through the adapter seam the
oracles no longer apply — the contract test in tests/test_multimodal.py
pins that the *plumbing* (schema, batching, plan) is decoder-invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.operators import multimodal as MM
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# Shared oracle scaffolding: the blob is the utf-8 encoding of `text`
# (mirroring binarize_text, NULL → empty), and its bytes are recovered in
# SQL from the hex string — byte i = 16*hi_nibble + lo_nibble, nibbles via
# strpos on a 15-char table ('0' maps to strpos 0). `bs` is the byte list.
_BYTES_CTE = r"""
b AS (
  SELECT doc_id AS id, hex(encode(coalesce(text, ''))) AS hx,
         octet_length(encode(coalesce(text, ''))) AS n
  FROM documents
), bytes AS (
  SELECT id, n,
         [strpos('123456789ABCDEF', substring(hx, 2*i+1, 1)) * 16
        + strpos('123456789ABCDEF', substring(hx, 2*i+2, 1)) for i in range(0, n)] AS bs
  FROM b
)
"""

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


# Stand-in decoder: fixed 16×16, mean intensity = mean byte value.
_IMAGE_SQL = f"""
WITH {_BYTES_CTE}
SELECT id, 16 AS width, 16 AS height,
       round(CASE WHEN n = 0 THEN 0.0 ELSE list_sum(bs) / n END, 6) AS mean_value,
       'fake' AS decoder
FROM bytes
ORDER BY id
"""


@register("mm_image_features", _IMAGE_SQL)
def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode plumbing over blob columns: the deterministic stand-in
    decoder's output (16×16, mean intensity = mean byte) is recomputed
    byte-for-byte by the oracle; a real codec drops in through the
    ``decoder`` adapter seam without engine changes."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    blobs = MM.binarize_text(docs)
    out = MM.extract_image_features(blobs)
    return out.select(
        "id", "width", "height", F.round("mean_value", 6).alias("mean_value"), "decoder"
    ).orderBy("id")


# Stand-in resize: len >= 64 → 64 buckets of step = n//64 bytes, pixel =
# floor(bucket mean) (numpy uint8 truncation); len < 64 → raw bytes
# zero-padded. The oracle reconstructs the exact pixel buffer and compares
# its hex — a value check of every output byte. List slicing is 1-based
# inclusive: bs[j*step+1 : (j+1)*step] is bucket j.
_RESIZE_SQL = f"""
WITH {_BYTES_CTE}, px AS (
  SELECT id,
         CASE WHEN n >= 64 THEN
           [CAST(floor(list_sum(bs[j*(n//64)+1 : (j+1)*(n//64)]) / (n//64)) AS INT)
            for j in range(0, 64)]
         ELSE bs || [0 for _ in range(0, 64 - n)] END AS pxs
  FROM bytes
)
SELECT id, 8 AS width, 8 AS height, 64 AS n_px,
       upper(array_to_string(list_transform(pxs, p -> lpad(to_hex(p), 2, '0')), '')) AS px_hex,
       'fake' AS decoder
FROM px
ORDER BY id
"""


@register("mm_resize_grid", _RESIZE_SQL)
def q_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-grid resize plumbing: every row yields an 8×8 pixel buffer;
    the oracle re-derives the mean-pooled pixel bytes and hash-compares
    the full buffer via its hex encoding."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = MM.resize_image(MM.binarize_text(docs), width=8, height=8)
    return out.select(
        "id",
        "width",
        "height",
        F.octet_length("pixels").alias("n_px"),
        F.upper(F.hex("pixels")).alias("px_hex"),
        "decoder",
    ).orderBy("id")


# Stand-in audio decode: unsigned 8-bit PCM at 16 kHz; RMS over the
# zero-centered signal. Σ(b-128)² is an exact integer (< 2^53), so numpy's
# pairwise sum and SQL's sequential sum are bit-identical before the one
# division + sqrt.
_AUDIO_SQL = f"""
WITH {_BYTES_CTE}
SELECT id, CAST(n AS BIGINT) AS n_samples,
       round(n / 16000.0, 6) AS duration_s,
       round(CASE WHEN n = 0 THEN 0.0 ELSE
         sqrt(list_sum([pow(x - 128.0, 2) for x in bs]) / n) END, 6) AS rms,
       'fake' AS decoder
FROM bytes
ORDER BY id
"""


@register("mm_audio_features", _AUDIO_SQL)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature plumbing: PCM-interpreted blobs → duration + RMS,
    recomputed exactly by the oracle from the blob bytes."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    out = MM.extract_audio_features(MM.binarize_text(docs))
    return out.select(
        "id",
        "n_samples",
        F.round("duration_s", 6).alias("duration_s"),
        F.round("rms", 6).alias("rms"),
        "decoder",
    ).orderBy("id")


# sample_frames spans: frame i covers [i·n/4, (i+1)·n/4) — the spans
# partition the blob, so Σ frame bytes = n, and the number of non-empty
# spans is min(n, 4) (for n < 4 each span is 0 or 1 byte; for n ≥ 4 every
# span has ≥ n//4 ≥ 1 bytes). Empty blobs emit no frames at all.
_FRAME_SQL = """
SELECT doc_id AS id,
       CAST(least(octet_length(encode(coalesce(text, ''))), 4) AS BIGINT) AS n_frames,
       CAST(octet_length(encode(coalesce(text, ''))) AS BIGINT) AS sampled_bytes
FROM documents
WHERE octet_length(encode(coalesce(text, ''))) > 0
ORDER BY id
"""


@register("mm_frame_sample_counts", _FRAME_SQL)
def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling dataflow (1→N mapInPandas): frames per blob + total
    sampled bytes, checked against the partition identity (spans cover the
    blob exactly once ⇒ counts and byte totals are closed-form)."""
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
