"""K-means: determinism of init, assignment invariant, IVF-over-kmeans recall."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from mapreduce_system_spark.operators import clustering as CL
from mapreduce_system_spark.operators import similarity as SIM
from mapreduce_system_spark.sources.tables import load_table


def _queries(emb, n=10):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_kmeans_fit_shape_and_determinism(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    c1 = CL.kmeans_fit(emb, k=4, max_iter=2)
    c2 = CL.kmeans_fit(emb, k=4, max_iter=2)
    assert len(c1) == 4 and len(c1[0]) == 64
    # deterministic init + same data → same centroids up to float-sum jitter
    for a, b in zip(c1, c2):
        assert all(math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9) for x, y in zip(a, b))


def test_kmeans_assign_is_nearest(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, [0.5, 0.0]), (3, [9.0, 10.0])],
        ["vec_id", "embedding"],
    )
    centroids = [[0.0, 0.0], [10.0, 10.0]]
    got = {r.vec_id: r.cluster for r in CL.kmeans_assign(df, centroids).collect()}
    assert got == {0: 0, 1: 1, 2: 0, 3: 1}


def test_kmeans_partitions_all_points(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    centroids = CL.kmeans_fit(emb, k=8, max_iter=3)
    assigned = CL.kmeans_assign(emb, centroids)
    stats = assigned.agg(
        F.count("*").alias("n"),
        F.countDistinct("cluster").alias("k_used"),
        F.min("cluster").alias("lo"),
        F.max("cluster").alias("hi"),
    ).collect()[0]
    assert stats.n == emb.count()
    assert 1 <= stats.k_used <= 8 and stats.lo >= 0 and stats.hi < 8


def test_ivf_over_kmeans_recall(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _queries(emb, 10)
    centroids = CL.kmeans_fit(emb, k=8, max_iter=5)
    clustered = CL.kmeans_assign(emb, centroids, out_col="cluster")
    exact = {(r.query_id, r.vec_id) for r in SIM.brute_force_topk(emb, q, k=5).collect()}
    approx = {
        (r.query_id, r.vec_id)
        for r in SIM.ivf_topk(clustered, q, k=5, nprobe=3, partition_col="cluster").collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF-over-kmeans recall {recall} collapsed"
