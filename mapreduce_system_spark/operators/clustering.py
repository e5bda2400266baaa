"""K-means clustering over ``array<float>`` embedding columns.

The iterative algorithm the similarity surface was missing: ``ivf_topk``
(operators/similarity.py) probes a coarse quantizer, and at 100 TB that
quantizer is a k-means fit — this module supplies it, so the IVF path is
self-contained instead of leaning on the fixture's precomputed ``label``.

Design (Lloyd's algorithm, Spark-shaped):
- Each iteration is ONE distributed pass over Arrow batches
  (``mapInPandas``): numpy matmul argmin assigns the batch, and the task
  emits per-cluster (count, sum-vector) partials — an explicit map-side
  combine, so what crosses the wire is partitions × k rows of k·d doubles,
  independent of corpus size. The driver merges partials into new means.
  (Per-row HOF folds were tried first: correct, but each iteration's plan
  re-analysis of k·d literal trees cost more than the data pass at small
  SF — this is exactly the "vectorized Pandas UDF over built-ins" case.)
- Centroids live on the driver between iterations (k·d floats — the only
  thing ever collected). This is the standard scalable formulation: the
  corpus is never moved, state that crosses the wire is O(k·d·iters).
- Deterministic: initial centroids are the k rows with the smallest ids
  (no RNG), so runs are reproducible machine-to-machine. Float-sum order
  inside a mean can still vary with partitioning, so downstream checks
  should assert set-level invariants (sizes, recall), not exact floats.

The reference has no clustering surface (its only workload is word count,
README.MD:25-53); this is part of the mandated LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_vec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def _dist2(vec: Column, centroid: list[float]) -> Column:
    """Squared L2 distance row-vector → literal centroid (JVM fold)."""
    diff = F.zip_with(
        vec, _lit_vec(centroid), lambda a, b: (a.cast("double") - b) * (a.cast("double") - b)
    )
    return F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x)


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid (squared L2, ties → lowest index).

    Built as array_min over (distance, index) structs — struct ordering
    compares field-by-field, so the tie-break is deterministic.
    """
    pairs = F.array(
        *[
            F.struct(_dist2(vec, c).alias("d"), F.lit(j).alias("j"))
            for j, c in enumerate(centroids)
        ]
    )
    return F.array_min(pairs)["j"]


def kmeans_fit(
    df: DataFrame,
    k: int = 8,
    max_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init: str = "first",
    tol: float = 1e-6,
) -> list[list[float]]:
    """Fit k centroids with Lloyd iterations; returns driver-side centroids.

    One distributed job per iteration; only k·d floats cross the wire.
    Initialization (all RNG-free, machine-to-machine reproducible):

    - ``init="first"`` (default): the k smallest-id rows. MEASURED BEST
      on the fixture (IVF-over-kmeans recall@5 0.90/0.92 at
      sf0.001/sf0.01 vs 0.72/0.66 for plusplus, 0.68/0.62 for
      farthest): ids are uncorrelated with embedding position, so the
      first k rows already sample the label clusters ~uniformly. The
      known failure mode is id-position correlation (e.g. data sorted
      by cluster) — switch init when ingest order is not exchangeable.
    - ``init="plusplus"``: deterministic k-means++ — D²-weighted
      sampling where the "randomness" is a per-row uniform derived from
      ``xxhash64(id)``, combined per Efraimidis–Spirakis (argmax of
      ln(u)/D² picks with probability ∝ D²). Seed spread like true
      k-means++ without RNG — the adversarial-layout fix — at k-1 cheap
      extra passes (TakeOrdered over a JVM fold) before Lloyd starts.
    - ``init="farthest"``: deterministic farthest-point traversal
      (always take the max-D² point). Maximal spread, but captures
      outliers — kept for k-center-style uses.

    Stops early when the max squared centroid shift drops to ``tol``
    (driver-side compare of k·d floats — free), so ``max_iter`` is a cap,
    not a fixed cost. An emptied cluster keeps its previous centroid.
    Fewer than k rows (or, for farthest init, fewer than k DISTINCT
    vectors) clamps k; an empty input raises a clear error instead of an
    opaque numpy shape failure.
    """
    import numpy as np

    from mapreduce_system_spark.pyfiles import ensure_package_on_executors

    if k < 1:
        raise ValueError(f"kmeans_fit: k must be >= 1, got {k}")
    if init not in ("first", "plusplus", "farthest"):
        # a typo ('kmeans++', 'plus_plus') must not silently fall back to
        # the adversarial-layout-vulnerable first-k init (r10 review)
        raise ValueError(f"kmeans_fit: unknown init {init!r}")
    ensure_package_on_executors(df.sparkSession)
    # One cached projection feeds the init passes and every iteration —
    # without it each pass re-reads the source. At cluster scale this is
    # the standard "cache the training set" step; memory = corpus vectors.
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v")).cache()
    # one try for everything after the cache: a failed collect in the
    # SEEDING passes must release the cached projection too, not just
    # a failure inside the Lloyd loop
    try:
        if init in ("plusplus", "farthest"):
            first = base.orderBy("__id").limit(1).collect()
            if not first:
                raise ValueError("kmeans_fit: input DataFrame has no rows")
            chosen = [list(map(float, first[0]["__v"]))]
            # deterministic uniform in (0, 1]: xxhash64 of the id, scaled
            m = float(1 << 32)
            u = ((F.pmod(F.xxhash64("__id"), F.lit(1 << 32))).cast("double") + 1.0) / m
            while len(chosen) < k:
                mind = (
                    F.least(*[_dist2(F.col("__v"), c) for c in chosen])
                    if len(chosen) > 1
                    else _dist2(F.col("__v"), chosen[0])
                )
                # Efraimidis–Spirakis one-sample key: argmax ln(u)/w samples
                # with probability ∝ w (= D²); D²=0 → -inf, never chosen.
                key = F.when(F.col("__d") > 0.0, F.ln(u) / F.col("__d")).otherwise(
                    F.lit(float("-inf"))
                ) if init == "plusplus" else F.col("__d")
                far = (
                    base.select("__id", "__v", mind.alias("__d"))
                    .select("__id", "__v", "__d", key.alias("__k"))
                    .orderBy(F.col("__k").desc(), "__id")
                    .limit(1)
                    .collect()[0]
                )
                if far["__d"] <= 0.0:
                    break  # fewer than k distinct vectors — clamp
                chosen.append(list(map(float, far["__v"])))
            centroids = np.asarray(chosen)
        else:
            seed_rows = base.orderBy("__id").limit(k).collect()
            if not seed_rows:
                raise ValueError("kmeans_fit: input DataFrame has no rows")
            centroids = np.asarray([list(map(float, r["__v"])) for r in seed_rows])
        k = len(centroids)  # possibly clamped
        d = centroids.shape[1]
        stats_schema = "cluster int, cnt long, vsum array<double>"
        for _ in range(max_iter):
            cm = centroids  # capture current value in the task closure
            c_sqn = (cm * cm).sum(axis=1)

            def partial_stats(batches):
                import pandas as pd

                # accumulate across the WHOLE partition's Arrow batches and
                # emit once — per-batch emission would scale the collected
                # rows with corpus size (batches ∝ rows/maxRecordsPerBatch),
                # breaking the partitions×k wire invariant (r10 review)
                sums = np.zeros((k, d))
                counts = np.zeros(k, dtype=np.int64)
                seen = False
                for pdf in batches:
                    if not len(pdf):
                        continue
                    seen = True
                    m = np.asarray([list(v) for v in pdf["__v"]], dtype=np.float64)
                    # argmin_j |x-c_j|^2 == argmin_j (|c_j|^2 - 2 x·c_j)
                    assign = (c_sqn - 2.0 * (m @ cm.T)).argmin(axis=1)
                    for j in np.unique(assign):
                        sel = m[assign == j]
                        counts[j] += len(sel)
                        sums[j] += sel.sum(axis=0)
                if seen:
                    nz = np.nonzero(counts)[0]
                    yield pd.DataFrame(
                        {
                            "cluster": [int(j) for j in nz],
                            "cnt": [int(counts[j]) for j in nz],
                            "vsum": [sums[j].tolist() for j in nz],
                        }
                    )

            # partial per-batch stats (the map-side combine): rows crossing
            # the wire = partitions × k, each k·d doubles — never the corpus.
            parts = base.select("__v").mapInPandas(partial_stats, schema=stats_schema).collect()
            sums = np.zeros((k, d))
            counts = np.zeros(k)
            for r in parts:
                sums[r.cluster] += np.asarray(r.vsum)
                counts[r.cluster] += r.cnt
            new_centroids = centroids.copy()
            nonempty = counts > 0
            new_centroids[nonempty] = sums[nonempty] / counts[nonempty, None]
            shift = float(((new_centroids - centroids) ** 2).sum(axis=1).max())
            centroids = new_centroids
            if shift <= tol:
                break  # converged — max_iter is a cap, not a fixed cost
    finally:
        base.unpersist()
    return [c.tolist() for c in centroids]


def kmeans_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Attach the nearest-centroid assignment — the IVF partition column."""
    return df.withColumn(out_col, nearest_centroid(F.col(vec_col), centroids))
