"""Round-8 additions (fifth batch): semantic outlier pruning + correlated
scalar subquery.

- ``emb_centroid_outliers`` — per-cluster semantic outlier scoring: the
  centroid of each label's embeddings, then every vector's cosine to its
  own centroid, reporting the 5 least-central vectors per label. This is
  the filtering half of centroid-based semantic curation (SemDeDup-style
  pipelines prune near-centroid duplicates AND far-from-centroid noise);
  the far tail is the one that needs an explicit query because it is the
  rows a training run wants quarantined.
- ``rel_scalar_subquery_q17`` — the correlated-scalar-subquery surface
  (TPC-H Q17 shape re-cut to the fixture columns): lineitems whose
  quantity is below half their part's average quantity. ONE ANSI string
  executes verbatim on Spark (temp views) and DuckDB; Catalyst
  decorrelates the subquery into a per-part aggregate + equi-join — the
  plan a hand-rolled two-pass query would build, derived automatically.

Scale notes are per-query; neither touches Python at any point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.operators.similarity import label_centroids
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table, register_views

# ---------------------------------------------------------------------------
# emb_centroid_outliers — per-label centroid, 5 least-central vectors each
# ---------------------------------------------------------------------------

_OUTLIER_K = 5

# The oracle recomputes the centroid relationally (position join) while the
# Spark side folds a broadcast centroid array inside each row — two
# independent formulations of the same algebra. Both rank on the ROUNDED
# cosine (tie-break vec_id) so ULP-level summation-order differences cannot
# flip the cut line.
_CENTROID_OUTLIERS_SQL = f"""
WITH pe AS (
  SELECT vec_id, label,
         unnest(generate_series(1, len(embedding))) AS pos,
         unnest(embedding) AS xf
  FROM embeddings
),
pe2 AS (SELECT vec_id, label, pos, CAST(xf AS DOUBLE) AS x FROM pe),
cent AS (SELECT label, pos, avg(x) AS c FROM pe2 GROUP BY label, pos),
dv AS (
  SELECT pe2.vec_id, pe2.label,
         sum(pe2.x * cent.c) AS dot,
         sum(pe2.x * pe2.x) AS n2v
  FROM pe2 JOIN cent ON cent.label = pe2.label AND cent.pos = pe2.pos
  GROUP BY pe2.vec_id, pe2.label
),
cn AS (SELECT label, sum(c * c) AS n2c FROM cent GROUP BY label),
scored AS (
  SELECT dv.vec_id, dv.label,
         round(dv.dot / nullif(sqrt(dv.n2v) * sqrt(cn.n2c), 0), 6) AS centroid_cos
  FROM dv JOIN cn ON cn.label = dv.label
  WHERE dv.n2v > 0
),
ranked AS (
  SELECT label, vec_id, centroid_cos,
         CAST(row_number() OVER (
           PARTITION BY label ORDER BY centroid_cos ASC NULLS LAST, vec_id) AS BIGINT) AS rk
  FROM scored
)
SELECT label, rk, vec_id, centroid_cos
FROM ranked
WHERE rk <= {_OUTLIER_K}
ORDER BY label, rk
"""


@register("emb_centroid_outliers", _CENTROID_OUTLIERS_SQL)
def q_centroid_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5 least-centroid-aligned vectors per label (semantic outlier pass).

    Plan shape, and why it survives 100 TB: the ONLY shuffle over the
    n·d exploded stream is the (label, pos) partial+final average —
    shuffled bytes are #labels × d, independent of corpus size. The
    per-label centroid arrays (#labels rows) broadcast back onto the
    unexploded table, and the cosine is a zip_with/aggregate fold
    computed entirely inside each row — scoring is map-only. The
    alternative (joining the exploded stream back to per-position
    centroids, as the DuckDB twin does) re-shuffles n·d rows; at 1000
    executors that join IS the job, which is why the Spark side avoids
    it. Top-k per label is a bounded per-group heap, never a global
    sort. (Reference contrast: no vector type at all — KeyValue is
    string/string, worker.go:26-29.)"""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    sumsq = lambda col: F.aggregate(col, F.lit(0.0), lambda acc, v: acc + v * v)  # noqa: E731
    # the ONE centroid-assembly definition (operators/similarity.py) —
    # a local re-derivation could drift from the exported-centroid
    # convention the sim/cluster oracles verify. Its squared norm is an
    # O(d) fold computed HERE, once per label row, not per corpus row.
    cent = label_centroids(emb, partition_col="label").withColumn(
        "_n2c", sumsq(F.col("centroid"))
    )
    xs = F.col("embedding").cast("array<double>")
    dot = F.aggregate(
        F.zip_with(xs, F.col("centroid"), lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        emb.join(F.broadcast(cent), "label")
        # let-bind the vector fold: _n2v serves the positivity filter AND
        # the denominator, so the O(d) fold runs once per row, not twice
        .select("label", "vec_id", dot.alias("_dot"), sumsq(xs).alias("_n2v"), "_n2c")
        .where(F.col("_n2v") > 0)
        .select(
            "label",
            "vec_id",
            # nullif on the norm product: a zero-norm centroid (components
            # cancel) must yield NULL on both engines — under ANSI Spark a
            # bare division ABORTS the whole query on it, DuckDB nulls it
            F.round(
                F.col("_dot")
                / F.nullif(F.sqrt(F.col("_n2v")) * F.sqrt(F.col("_n2c")), F.lit(0.0)),
                6,
            ).alias("centroid_cos"),
        )
    )
    # asc_nulls_last: a zero-norm centroid yields a NULL cosine on both
    # engines, but Spark ASC defaults NULLS FIRST while DuckDB defaults
    # NULLS LAST — the one ASC rank in the catalog must pin the order
    rk = F.row_number().over(
        W.partitionBy("label").orderBy(F.col("centroid_cos").asc_nulls_last(), "vec_id")
    )
    return (
        scored.select("label", rk.cast("long").alias("rk"), "vec_id", "centroid_cos")
        .where(F.col("rk") <= _OUTLIER_K)
        .orderBy("label", "rk")
    )


# ---------------------------------------------------------------------------
# rel_scalar_subquery_q17 — correlated scalar subquery, decorrelated
# ---------------------------------------------------------------------------

# One string, two engines. Exactness note: l_quantity is integral-valued
# (TPC-H contract), so each part's avg is an exactly-summed rational and
# the `<` cut agrees bit-for-bit regardless of either engine's summation
# order — no epsilon anywhere in the predicate.
_Q17_SQL = """
SELECT p.p_brand,
       CAST(count(*) AS BIGINT) AS n_small_lots,
       round(sum(l.l_extendedprice), 2) AS small_lot_revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE l.l_quantity < (
  SELECT 0.5 * avg(l2.l_quantity)
  FROM lineitem l2
  WHERE l2.l_partkey = l.l_partkey
)
GROUP BY p.p_brand
ORDER BY p.p_brand
"""


@register("rel_scalar_subquery_q17", _Q17_SQL)
def q_scalar_subquery_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-lot revenue by brand — the correlated-scalar-subquery front
    door (TPC-H Q17 shape on the fixture's columns).

    Catalyst decorrelates the subquery into avg-per-partkey + an
    equi-join back onto lineitem (verify: the optimized plan has an
    Aggregate on l_partkey feeding a join, no per-row re-scan), then
    joins the broadcast-sized part dim. At 100 TB that is two scans of
    lineitem + one partkey-shuffle — the same cost as writing the
    two-pass query by hand, with the optimizer deriving it from the
    declarative form. (Reference contrast: expressing this takes two
    chained MapReduce jobs with a manual side-channel for the per-part
    averages — coordinator.go:126-141 runs exactly one map+reduce.)"""
    register_views(spark, sf_dir, ("lineitem", "part"))
    return spark.sql(_Q17_SQL)
