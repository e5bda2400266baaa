"""Round-8 additions (twelfth batch — registered past the 50-query
driver window behind fresh8k; rotates in r9).

Two operators:

- ``rel_pit_join_scd2`` — point-in-time enrichment: each click event
  is joined to the SCD2 validity interval (built live from the SAME
  user's non-click activity) that contains its timestamp. THE
  warehouse lookup pattern — "which state was the dimension in when
  this fact happened" — that a plain equi-join gets silently wrong
  (it would match every historical state). Equi-join on user_id with
  an interval residual; one shuffle.
- ``agg_mad_outliers`` — robust outlier screening per group: median
  absolute deviation with the 1.4826 normal-consistency constant and
  a 3σ-equivalent cut. Mean/stddev outlier screens (z-score) break
  down exactly when outliers are present (the outliers inflate the
  stddev that is supposed to catch them); MAD is the 50%-breakdown
  estimator curation pipelines use instead. Both medians come from
  the spill-safe rank-based selection ``agg_quantiles`` introduced —
  NO memory-buffering percentile aggregate anywhere.

Float discipline per registry.py: medians interpolate bit-identical
selected values; the outlier threshold compares identically-derived
doubles, so the flag — and therefore the exact-integer counts — agree
across engines; ratios divide exact integers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# rel_pit_join_scd2 — facts joined to their point-in-time dimension state
# ---------------------------------------------------------------------------

_PIT_SQL = """
WITH nc AS (
  SELECT user_id, event_type, ts, event_id,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events WHERE event_type <> 'click'
),
iv AS (
  SELECT user_id, event_type AS state,
         CAST(epoch_us(ts) AS BIGINT) AS from_us,
         CAST(epoch_us(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))
              AS BIGINT) AS to_us
  FROM nc WHERE prev_type IS NULL OR prev_type <> event_type
),
f AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us, value
  FROM events WHERE event_type = 'click'
)
SELECT coalesce(iv.state, 'none') AS state,
       CAST(count(*) AS BIGINT) AS n_clicks,
       round(sum(f.value), 2) AS total_value
FROM f
LEFT JOIN iv ON iv.user_id = f.user_id
            AND f.ts_us >= iv.from_us
            AND (iv.to_us IS NULL OR f.ts_us < iv.to_us)
GROUP BY 1
ORDER BY 1
"""


@register("rel_pit_join_scd2", _PIT_SQL)
def q_pit_join_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: every click is attributed to the dimension
    state (the user's latest non-click event type) whose SCD2 validity
    interval contains the click's timestamp; clicks before any state
    exist report 'none'. Output: per-state click counts and value.

    The interval algebra is ``rel_scd2_intervals``'s (lag change
    detection + lead interval close, ONE exchange+sort); the
    enrichment is an equi-join on user_id with the interval residual
    evaluated inside the join — intervals per user are non-overlapping
    by construction, so each fact matches at most one state and the
    join never amplifies. At 100 TB both sides shuffle once on
    user_id; the dimension side is the COMPACTED interval table (one
    row per state change), not the raw history — the reason SCD2 went
    into the catalog in the first place."""
    ev = load_table(
        spark, sf_dir, "events",
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    nc = ev.where(F.col("event_type") != "click").withColumn(
        "prev_type", F.lag("event_type").over(w)
    )
    iv = (
        nc.where(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            F.col("user_id").alias("d_user"),
            F.col("event_type").alias("state"),
            F.unix_micros("ts").alias("from_us"),
            F.unix_micros(F.lead("ts").over(w)).alias("to_us"),
        )
    )
    f = ev.where(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "value"
    )
    cond = (
        (F.col("d_user") == F.col("user_id"))
        & (F.col("ts_us") >= F.col("from_us"))
        & (F.col("to_us").isNull() | (F.col("ts_us") < F.col("to_us")))
    )
    return (
        f.join(iv, cond, "left")
        .groupBy(F.coalesce(F.col("state"), F.lit("none")).alias("state"))
        .agg(
            F.count("*").alias("n_clicks"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .orderBy("state")
    )


# ---------------------------------------------------------------------------
# agg_mad_outliers — median-absolute-deviation outlier screen per group
# ---------------------------------------------------------------------------

_MAD_K = 1.4826  # normal-consistency constant: MAD * 1.4826 ≈ σ for Gaussians
_MAD_CUT = 3.0


def _group_median(df: DataFrame, g: str, value: Column, out: str) -> DataFrame:
    """Exact per-group linear-interpolation median via rank-based
    selection (``agg_quantiles``'s spill-safe shape): disk-backed sort,
    broadcast counts, keep only the two interpolation ranks.

    Parallelism is min(groups, cores) — each group sorts in one
    disk-backed task. A distributed-rank variant (repartitionByRange
    over (group, value), per-cell row_number, broadcast cumulative
    offsets) lifts that to the partition count but pays a range-sampling
    pass plus a second full-data shuffle: measured ADVERSE at sf0.1
    (2.1-2.8 s → 3.6-3.8 s full-query, results identical), so the
    single-sort shape stays. It becomes the right trade only when a hot
    group dwarfs a core's sort throughput — at that scale prefer the
    documented sketch path (``agg_approx_quantiles``) first."""
    v = value.alias("v")
    src = df.select(F.col(g), v)
    # NULL discipline, the full agg_quantiles pattern (queries/advanced.py):
    # quantile_cont IGNORES NULL values, so they must not be ranked (Spark
    # sorts them FIRST ascending, shifting every selected rank) — hence
    # count("v"), which skips NULLs, over the UNFILTERED input, so every
    # group survives (an all-NULL group carries cnt=0 and comes out with a
    # NULL median exactly like GROUP BY + quantile_cont; ADVICE r10). The
    # joins are eqNullSafe because GROUP BY treats NULL as a group but an
    # equi-join key never matches NULL — a plain join(g) would silently
    # hand a NULL-keyed group a NULL median even when it has values.
    cnts = src.groupBy(g).agg(F.count("v").alias("cnt"))
    ranked = (
        src.where(F.col("v").isNotNull())
        .select(
            g, "v", F.row_number().over(W.partitionBy(g).orderBy("v")).alias("rn")
        )
        .alias("r")
        .join(
            F.broadcast(cnts.alias("c")),
            F.col(f"r.{g}").eqNullSafe(F.col(f"c.{g}")),
        )
        .select(F.col(f"r.{g}").alias(g), "v", "rn", "cnt")
    )
    lo = F.floor(F.lit(0.5) * (F.col("cnt") - 1)).cast("long") + 1
    hi = F.least(lo + 1, F.col("cnt"))
    frac = (F.lit(0.5) * (F.col("cnt") - 1)) - F.floor(F.lit(0.5) * (F.col("cnt") - 1))
    picked = ranked.where((F.col("rn") == lo) | (F.col("rn") == hi))
    med = picked.groupBy(g).agg(
        (
            F.max(F.when(F.col("rn") == lo, F.col("v")))
            + F.first(frac)
            * (
                F.max(F.when(F.col("rn") == hi, F.col("v")))
                - F.max(F.when(F.col("rn") == lo, F.col("v")))
            )
        ).alias(out)
    )
    # LEFT join back onto the full group list (free: cnts already holds
    # every group) — all-NULL groups survive with a NULL median
    return (
        cnts.alias("c")
        .join(
            F.broadcast(med.alias("m")),
            F.col(f"c.{g}").eqNullSafe(F.col(f"m.{g}")),
            "left",
        )
        .select(F.col(f"c.{g}").alias(g), out)
    )


_MAD_SQL = f"""
WITH med AS (
  SELECT l_returnflag AS flag, quantile_cont(l_extendedprice, 0.5) AS med
  FROM lineitem GROUP BY 1
),
dev AS (
  SELECT l.l_returnflag AS flag, l.l_extendedprice AS v, m.med,
         abs(l.l_extendedprice - m.med) AS ad
  FROM lineitem l JOIN med m ON m.flag = l.l_returnflag
),
mad AS (SELECT flag, quantile_cont(ad, 0.5) AS mad FROM dev GROUP BY 1)
SELECT d.flag,
       CAST(count(*) AS BIGINT) AS n,
       round(max(d.med), 4) AS median_price,
       round(max(m.mad), 4) AS mad,
       CAST(sum(CASE WHEN d.ad > {_MAD_CUT} * {_MAD_K} * m.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers,
       round(CAST(sum(CASE WHEN d.ad > {_MAD_CUT} * {_MAD_K} * m.mad THEN 1 ELSE 0 END)
                  AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS outlier_rate
FROM dev d JOIN mad m ON m.flag = d.flag
GROUP BY d.flag
ORDER BY d.flag
"""


@register("agg_mad_outliers", _MAD_SQL)
def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier screen per return flag: median price, median
    absolute deviation, and the count/rate of rows beyond
    3 · 1.4826 · MAD — the 50%-breakdown alternative to z-scores
    (``udf_grouped_map_zscore``'s statistical complement: the z-score
    screen's mean and stddev are themselves dragged by the outliers
    it hunts; the median and MAD are not).

    Two spill-safe rank-selection medians (value, then absolute
    deviation) with broadcast joins of the 3-row per-group scalars
    between passes, then one counting aggregate — three shuffles
    total, no percentile buffer, no window over the full data. The
    cut compares doubles derived identically on both engines, so the
    boolean — and the exact integer counts — cannot diverge."""
    g = "l_returnflag"
    li = load_table(spark, sf_dir, "lineitem", columns=[g, "l_extendedprice"])
    med = _group_median(li, g, F.col("l_extendedprice"), "med")
    dev = li.join(F.broadcast(med), g).select(
        F.col(g).alias("flag"),
        F.col("med"),
        F.abs(F.col("l_extendedprice") - F.col("med")).alias("ad"),
    )
    mad = _group_median(dev, "flag", F.col("ad"), "mad")
    d = dev.join(F.broadcast(mad), "flag")
    is_out = F.col("ad") > F.lit(_MAD_CUT) * F.lit(_MAD_K) * F.col("mad")
    return (
        d.groupBy("flag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("med"), 4).alias("median_price"),
            F.round(F.max("mad"), 4).alias("mad"),
            F.sum(F.when(is_out, 1).otherwise(0)).cast("long").alias("n_outliers"),
            F.round(
                F.sum(F.when(is_out, 1).otherwise(0)).cast("double")
                / F.count("*").cast("double"),
                6,
            ).alias("outlier_rate"),
        )
        .orderBy("flag")
    )
