"""Registered similarity-search queries over the embeddings table.

Brute-force and blocked-pairs are exact → full DuckDB oracles
(``list_cosine_similarity`` on DOUBLE[] matches the double fold in
``functions.vectors`` to well past the 6-digit rounding). IVF and LSH are
approximate → rows-only checks, with recall asserted against brute force
in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.operators import similarity as SIM
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_N_QUERIES = 10
_TOPK = 5


def _query_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return emb.where(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {_N_QUERIES}
), s AS (
  SELECT query_id, vec_id,
         list_cosine_similarity(qv::DOUBLE[], embedding::DOUBLE[]) AS c
  FROM q CROSS JOIN embeddings
  WHERE vec_id <> query_id
), r AS (
  SELECT query_id, vec_id, c,
         CAST(row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS BIGINT) AS rn
  FROM s
)
SELECT query_id, vec_id, round(c, 6) AS cos, rn
FROM r WHERE rn <= {_TOPK}
ORDER BY query_id, rn
"""


@register("sim_topk_bruteforce", _TOPK_SQL)
def q_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for 10 query vectors — broadcast
    nested-loop scan of the corpus, ranked per query."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = SIM.brute_force_topk(emb, _query_set(spark, sf_dir), k=_TOPK)
    return out.select(
        "query_id", "vec_id", F.round("cos", 6).alias("cos"), "rn"
    ).orderBy("query_id", "rn")


@register("sim_topk_ivf")  # approximate (nprobe < n_partitions) → rows-only
def q_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5: probe the 3 nearest label-centroids per query, exact
    cosine inside probed partitions (~30% of the corpus scanned)."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    out = SIM.ivf_topk(emb, _query_set(spark, sf_dir), k=_TOPK, nprobe=3)
    return out.select(
        "query_id", "vec_id", F.round("cos", 6).alias("cos"), "rn"
    ).orderBy("query_id", "rn")


@register("sim_topk_lsh")  # approximate (bucketed candidates) → rows-only
def q_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH top-5: same-bucket candidates from the union
    of 2 independent hash tables (16 buckets each — OR-amplified recall),
    exact cosine + rank within candidates."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    out = SIM.lsh_bucket_topk(emb, _query_set(spark, sf_dir), k=_TOPK, n_planes=4, n_tables=2)
    return out.select(
        "query_id", "vec_id", F.round("cos", 6).alias("cos"), "rn"
    ).orderBy("query_id", "rn")


@register("cluster_kmeans_ivf_topk")  # iterative k-means → rows-only
def q_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-5 over a *learned* coarse quantizer: deterministic k-means
    (operators/clustering.py, 8 clusters, 3 Lloyd iterations) replaces the
    fixture's precomputed label — the self-contained form an ANN index
    build uses at scale. Iterative, so no SQL oracle (driver records
    rows-only); recall vs brute force is asserted in
    tests/test_similarity.py."""
    from mapreduce_system_spark.operators import clustering as CL

    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centroids = CL.kmeans_fit(emb, k=8, max_iter=3)
    clustered = CL.kmeans_assign(emb, centroids, out_col="cluster")
    out = SIM.ivf_topk(
        clustered,
        _query_set(spark, sf_dir),
        k=_TOPK,
        nprobe=3,
        partition_col="cluster",
        centroids_list=centroids,
    )
    return out.select(
        "query_id", "vec_id", F.round("cos", 6).alias("cos"), "rn"
    ).orderBy("query_id", "rn")


_DUP_PAIRS_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
ORDER BY id_a, id_b
"""


@register("sim_dup_pairs_cosine", _DUP_PAIRS_SQL)
def q_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.4) within label blocks —
    blocked equi-join, exact within block."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    out = SIM.cosine_dup_pairs(emb, threshold=0.4, block_col="label")
    return out.select("id_a", "id_b", F.round("cos", 6).alias("cos")).orderBy("id_a", "id_b")


@register("emb_random_projection_profile")  # randomized transform → rows-only
def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss 64→16 projection profile per label: norm
    compression ratio ≈ 1 when distances are preserved. Deterministic
    seeded matrix, but not SQL-expressible → rows-only check; distance
    preservation is asserted in tests/test_similarity.py."""
    from mapreduce_system_spark.functions.vectors import norm

    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    proj = SIM.random_projection(emb, in_dim=64, out_dim=16, keep_input=True)
    return (
        proj.select(
            "label",
            (norm(F.col("projected")) / norm(F.col("embedding"))).alias("ratio"),
        )
        .groupBy("label")
        .agg(F.count("*").alias("n"), F.round(F.avg("ratio"), 3).alias("avg_norm_ratio"))
        .orderBy("label")
    )
