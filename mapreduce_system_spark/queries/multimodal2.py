"""Full-color JPEG pipeline query (VERDICT r9 #3's serving surface).

``mm_image_rgb_stats`` drives the complete in-container color path:
deterministic RGB images are synthesized per document, encoded to real
baseline JPEGs (``encode_image_jpeg_baseline`` — Annex K tables, 4:2:0),
decoded back through the chroma-reconstructing stdlib decoder
(``decode_image_jpeg_rgb``), and reduced to the per-channel statistics a
color-dependent curation signal needs. Verification is the export
pattern (queries/similarity.py): the decoded channel planes — the only
step SQL cannot re-derive — are materialized as a side table, and BOTH
engines compute the statistics from that export with relational array
folds; decode pixel-exactness itself is pinned by the encoder-fixture
tests in tests/test_multimodal.py.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.operators import multimodal as MM
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_N_IMAGES = 200  # deterministic subset: doc_id < 200 exists at every sf


def _rgb_path(sf_name: str) -> str:
    return f"/tmp/spark_graft_rgb_planes_{sf_name}"


def _synth_jpeg_blobs(docs: DataFrame) -> DataFrame:
    """(doc_id) → (id, blob): a doc_id-parameterized RGB gradient,
    encoded as a real 4:2:0 baseline JPEG. Sizes cycle through
    MCU-aligned and unaligned shapes so padding/upsample/crop all run."""
    from mapreduce_system_spark.pyfiles import ensure_package_on_executors

    ensure_package_on_executors(docs.sparkSession)

    def synth(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, blobs = [], []
            for i in pdf["doc_id"]:
                i = int(i)
                w = 16 + (i % 3) * 4   # 16 / 20 / 24
                h = 12 + (i % 2) * 9   # 12 / 21
                yy, xx = np.mgrid[0:h, 0:w]
                r = (yy * (3 + i % 5) + xx * (1 + i % 7) + i) % 256
                g = (yy * 2 + xx * 11 + i * 13) % 256
                b = (255 - yy * 5 - xx * 3 + i * 29) % 256
                rgb = np.stack([r, g, b], axis=2).astype(np.uint8)
                ids.append(i)
                blobs.append(MM.encode_image_jpeg_baseline(rgb, subsampling=(2, 2)))
            yield pd.DataFrame({"id": ids, "blob": blobs})

    return docs.select("doc_id").mapInPandas(synth, schema="id long, blob binary")


# Stats are re-derived from the exported planes on both sides: channel
# mean = exact integer sum / count, divided once — bit-identical across
# engines before the rounding.
_RGB_STATS_SQL = f"""
SELECT id, width, height,
       round(CAST(list_sum(r) AS DOUBLE) / len(r), 4) AS mean_r,
       round(CAST(list_sum(g) AS DOUBLE) / len(g), 4) AS mean_g,
       round(CAST(list_sum(b) AS DOUBLE) / len(b), 4) AS mean_b,
       round(CAST(list_sum(list_transform(list_zip(r, g), z -> abs(z[1] - z[2]))) AS DOUBLE)
             / len(r), 4) AS mean_rg_gap
FROM read_parquet('{_rgb_path("sf0.01")}/*.parquet')
ORDER BY id
"""


@register("mm_image_rgb_stats", _RGB_STATS_SQL, sf_bound=True)
def q_image_rgb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → color-decode → per-channel curation stats for 200
    deterministic JPEGs: channel means plus the mean |R−G| gap (a cheap
    colorfulness signal a gray pipeline cannot produce — the class of
    statistic VERDICT r9 #2 noted would silently narrow to luma before
    the chroma path existed).

    The decode pass (the one Python stage) runs once and its channel
    planes are exported; the statistics below are JVM array folds over
    the re-read export, mirrored exactly by the SQL oracle."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id"]).where(
        F.col("doc_id") < _N_IMAGES
    )
    planes = MM.decode_image_rgb_planes(_synth_jpeg_blobs(docs))
    path = _rgb_path(Path(sf_dir).name)
    planes.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)

    def chan_mean(c: str):
        s = F.aggregate(F.col(c), F.lit(0.0), lambda a, x: a + x.cast("double"))
        return F.round(s / F.size(F.col(c)), 4)

    rg_gap = F.aggregate(
        F.zip_with(F.col("r"), F.col("g"), lambda a, b: F.abs(a - b)),
        F.lit(0.0),
        lambda a, x: a + x.cast("double"),
    )
    return back.select(
        "id",
        "width",
        "height",
        chan_mean("r").alias("mean_r"),
        chan_mean("g").alias("mean_g"),
        chan_mean("b").alias("mean_b"),
        F.round(rg_gap / F.size(F.col("r")), 4).alias("mean_rg_gap"),
    ).orderBy("id")
