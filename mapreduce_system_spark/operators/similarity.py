"""Similarity search over ``array<float>`` embedding columns.

North-star LLM-pipeline surface (BASELINE.json north_star). Three tiers,
all pure DataFrame ops (cosine is the JVM-side fold from
``functions.vectors`` — no Python in the hot path):

- ``brute_force_topk`` — exact: broadcast the (small) query set, score
  every (query, vector) pair, rank per query. O(N·Q·d) flops,
  embarrassingly parallel, zero shuffle of the corpus side; the baseline
  every approximate method is measured against. Right answer at any corpus
  size *when Q is small*.
- ``ivf_topk`` — approximate: partition the corpus by a coarse quantizer
  (here: the precomputed cluster/label column; at 100 TB a k-means
  assignment), probe the ``nprobe`` nearest centroids per query, exact
  cosine within probed partitions only. Turns the scan into an equi-join
  on partition id — the classic IVF trade (recall vs fraction scanned).
- ``lsh_bucket_topk`` — approximate: random-hyperplane (SimHash-for-
  vectors) bucketing; candidates = same-bucket equi-join. Deterministic
  planes derived from a fixed seed.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.functions.vectors import cosine, dot_double, with_unit_vector


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors per query via broadcast cross join.

    The query side is broadcast (BroadcastNestedLoopJoin) so the corpus is
    scanned once with no shuffle; the per-query ranked window shuffles only
    the scored rows (N·Q), partitioned by query id.
    """
    c = with_unit_vector(corpus, vec_col, "__cu")
    q = with_unit_vector(queries, query_vec_col, "__qu")
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            dot_double(F.col("__qu"), F.col("__cu")).alias("cos"),
        )
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return (
        scored.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= k)
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    partition_col: str = "label",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    centroids_list: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style approximate top-k: probe the nprobe nearest coarse
    centroids per query, exact cosine within probed partitions.

    Centroids: pass ``centroids_list`` when the quantizer was just fit
    (``operators.clustering.kmeans_fit`` — centroid i ↔ partition id i);
    otherwise they are derived as the per-partition mean vectors with one
    aggregation. The corpus side is touched via an equi-join on the
    partition id — scanned fraction ≈ nprobe/n_partitions.
    """
    spark = corpus.sparkSession
    if centroids_list is not None:
        centroids = spark.createDataFrame(
            [(j, [float(x) for x in c]) for j, c in enumerate(centroids_list)],
            f"{partition_col} int, centroid array<double>",
        )
    else:
        dim = len(corpus.select(vec_col).first()[0])
        centroids = (
            corpus.select(partition_col, *[F.col(vec_col)[i].alias(f"c{i}") for i in range(dim)])
            .groupBy(partition_col)
            .agg(*[F.avg(f"c{i}").alias(f"c{i}") for i in range(dim)])
            .select(partition_col, F.array(*[f"c{i}" for i in range(dim)]).alias("centroid"))
        )
    probe_w = W.partitionBy(query_id_col).orderBy(F.col("cdist").desc(), F.col(partition_col))
    probes = (
        queries.crossJoin(F.broadcast(centroids))
        .select(
            query_id_col,
            query_vec_col,
            partition_col,
            cosine(F.col(query_vec_col), F.col("centroid")).alias("cdist"),
        )
        .withColumn("pr", F.row_number().over(probe_w))
        .where(F.col("pr") <= nprobe)
        .select(query_id_col, query_vec_col, partition_col)
    )
    scored = (
        with_unit_vector(corpus, vec_col, "__cu")
        .join(F.broadcast(with_unit_vector(probes, query_vec_col, "__qu")), partition_col)
        .where(F.col(id_col) != F.col(query_id_col))
        .select(query_id_col, id_col, dot_double(F.col("__qu"), F.col("__cu")).alias("cos"))
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).where(F.col("rn") <= k)


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-bucket LSH."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket(vec, planes: list[list[float]]):
    """Bucket id = sign-bit pattern of the vector against each plane."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a.cast("double") * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    seed: int = 42,
    n_tables: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k via random-hyperplane buckets: candidates are the
    query's own bucket (equi-join on bucket id), then exact cosine + rank.

    Recall knobs: fewer planes → bigger buckets; more ``n_tables`` → the
    union of candidates from independent hash tables (planes seeded
    seed+t) — standard OR-amplification. A true neighbor is missed only
    if it bucket-mismatches in EVERY table, so miss probability decays
    geometrically in n_tables while cost grows linearly (t equi-joins;
    duplicate candidates collapse in a distinct before ranking). Recall
    monotonicity vs brute force is asserted in tests/test_similarity.py.
    """
    dim = len(corpus.select(vec_col).first()[0])
    cu = with_unit_vector(corpus, vec_col, "__cu")
    qu = with_unit_vector(queries, query_vec_col, "__qu")
    per_table = []
    for t in range(n_tables):
        planes = hyperplanes(dim, n_planes, seed + t)
        bucketed = cu.select(
            id_col, "__cu", lsh_bucket(F.col(vec_col), planes).alias("bucket")
        )
        q_bucketed = qu.select(
            query_id_col, lsh_bucket(F.col(query_vec_col), planes).alias("bucket")
        )
        per_table.append(
            bucketed.join(F.broadcast(q_bucketed), "bucket")
            .where(F.col(id_col) != F.col(query_id_col))
            .select(query_id_col, id_col, "__cu")
        )
    cand = per_table[0]
    for other in per_table[1:]:
        cand = cand.unionByName(other)
    if n_tables > 1:
        # dedupe candidate PAIRS before scoring: a pair colliding in all t
        # tables would otherwise be scored t times and collapsed by a
        # distinct over a recomputed double — dropping the unit vector
        # first makes the distinct a cheap 2-key dedup and scores once.
        cand = (
            cand.select(query_id_col, id_col).distinct()
            .join(cu.select(id_col, "__cu"), id_col)
        )
    scored = cand.join(
        F.broadcast(qu.select(query_id_col, "__qu")), query_id_col
    ).select(query_id_col, id_col, dot_double(F.col("__qu"), F.col("__cu")).alias("cos"))
    w = W.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return scored.withColumn("rn", F.row_number().over(w).cast("long")).where(F.col("rn") <= k)


def brute_force_topk_arrow(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k via Arrow-batched numpy matmul — the BLAS formulation.

    The (small, by contract) query set is collected once and shipped in
    the task closure as a normalized float64 matrix; each corpus Arrow
    batch scores B×Q with one matmul and emits only its per-batch top-k
    per query (a per-partition heap — candidates ∝ partitions·Q·k, never
    the corpus). A final per-query window picks the global top-k from
    candidates. Same O(N·Q·d) flops as the JVM fold, executed as
    vectorized BLAS — the right shape when d·Q is large.
    """
    import numpy as np

    from mapreduce_system_spark.pyfiles import ensure_package_on_executors

    ensure_package_on_executors(corpus.sparkSession)
    q_rows = queries.select(query_id_col, query_vec_col).collect()
    qids = [r[0] for r in q_rows]
    qm = np.asarray([list(r[1]) for r in q_rows], dtype=np.float64)
    qn = np.linalg.norm(qm, axis=1)
    qn[qn == 0] = 1.0
    qm = qm / qn[:, None]

    import pandas as pd
    from typing import Iterator

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            ids = pdf[id_col].to_numpy()
            m = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            s = (m / n[:, None]) @ qm.T  # B×Q cosine matrix
            out = {"query_id": [], "vec_id": [], "cos": []}
            for j, qid in enumerate(qids):
                col = s[:, j]
                mask = ids != qid
                order = np.lexsort((ids[mask], -col[mask]))[:k]
                sel_ids = ids[mask][order]
                sel_cos = col[mask][order]
                out["query_id"].extend([qid] * len(sel_ids))
                out["vec_id"].extend(sel_ids.tolist())
                out["cos"].extend(sel_cos.tolist())
            yield pd.DataFrame(out)

    cand = corpus.select(id_col, vec_col).mapInPandas(
        score, schema=f"{query_id_col} long, {id_col} long, cos double"
    )
    w = W.partitionBy(query_id_col).orderBy(F.col("cos").desc(), F.col(id_col))
    return cand.withColumn("rn", F.row_number().over(w).cast("long")).where(F.col("rn") <= k)


def cosine_dup_pairs(
    corpus: DataFrame,
    threshold: float = 0.4,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-dup pairs within blocks: equi-join on the blocking
    column (cluster/label/shard), exact cosine ≥ threshold.

    Blocking is what makes pairwise near-dup feasible at scale — candidates
    are same-block pairs, never the full n² cross product. With no natural
    block, derive one (IVF assignment or LSH bucket)."""
    units = with_unit_vector(corpus, vec_col, "__u")
    a = units.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_a"), F.col("__u").alias("ua")
    )
    b = units.select(
        F.col(block_col).alias("blk"), F.col(id_col).alias("id_b"), F.col("__u").alias("ub")
    )
    return (
        a.join(b, "blk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot_double(F.col("ua"), F.col("ub")).alias("cos"))
        .where(F.col("cos") >= threshold)
    )


def cosine_dup_pairs_arrow(
    corpus: DataFrame,
    threshold: float = 0.4,
    block_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Arrow/BLAS twin of ``cosine_dup_pairs``: one numpy matmul per block
    via ``applyInPandas`` (4× faster than the per-pair JVM fold at sf0.1;
    bitwise-identical pairs — asserted in tests/test_similarity.py).

    Memory trade vs the JVM join: each task materializes its whole block
    plus the B×B score matrix (O(B·d + B²) doubles), where the equi-join
    streams candidate pairs with spill. Use this form when the blocker
    bounds B (e.g. IVF cells sized to memory); use the join form when
    block sizes are unbounded or skewed."""
    import numpy as np

    from mapreduce_system_spark.pyfiles import ensure_package_on_executors

    ensure_package_on_executors(corpus.sparkSession)

    def block_pairs(pdf):
        import pandas as pd

        ids = pdf[id_col].to_numpy()
        m = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
        n = np.linalg.norm(m, axis=1)
        n[n == 0] = 1.0
        u = m / n[:, None]
        s = u @ u.T
        ia, ib = np.where(np.triu(s >= threshold, k=1))
        lo = np.minimum(ids[ia], ids[ib])
        hi = np.maximum(ids[ia], ids[ib])
        return pd.DataFrame({"id_a": lo, "id_b": hi, "cos": s[ia, ib]})

    return corpus.groupBy(block_col).applyInPandas(
        block_pairs, schema="id_a long, id_b long, cos double"
    )


def random_projection(
    df: DataFrame,
    in_dim: int,
    out_dim: int = 16,
    vec_col: str = "embedding",
    out_col: str = "projected",
    seed: int = 42,
    keep_input: bool = False,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: embed ``in_dim`` vectors
    into ``out_dim`` dims preserving pairwise distances within
    O(sqrt(ln n / out_dim)) relative error.

    The projection matrix is a fixed seeded Gaussian (scaled 1/sqrt(k)),
    generated identically on every executor from the seed — nothing is
    shuffled or broadcast; the map is embarrassingly parallel Arrow-batched
    numpy matmul. The standard pre-step before expensive ANN indexing when
    d is large.

    ``keep_input=True`` carries ``vec_col`` through to the output (needed
    when downstream expressions reference both the original and projected
    vectors, e.g. norm-preservation profiling); default drops it, since at
    scale the whole point is to shed the wide column before the shuffle."""
    import numpy as np

    from mapreduce_system_spark.pyfiles import ensure_package_on_executors

    ensure_package_on_executors(df.sparkSession)
    rng = np.random.default_rng(seed)
    R = (rng.standard_normal((out_dim, in_dim)) / np.sqrt(out_dim)).astype(np.float64)
    out_cols = [c for c in df.columns if keep_input or c != vec_col]

    def project(batches):
        import pandas as pd

        for pdf in batches:
            if not len(pdf):
                continue
            m = np.asarray([list(v) for v in pdf[vec_col]], dtype=np.float64)
            proj = m @ R.T
            out = pdf[out_cols].copy()
            out[out_col] = [row.tolist() for row in proj]
            yield out

    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema if f.name in out_cols]
        + [f"{out_col} array<double>"]
    )
    return df.mapInPandas(project, schema=schema)
