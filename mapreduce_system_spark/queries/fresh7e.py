"""Round-7 addition (final batch): ordered-event funnel analysis.

``rel_funnel_conversion`` — the product-analytics staple: how many
users progress view → click → purchase IN ORDER, and how long each
transition takes. Order matters: a purchase before the first
qualifying click must not count, so this is sequence matching, not
three independent filters. The reference's sort-by-key reduce
(worker.go:153-165) groups a user's events but gives reducef no
secondary order, so even the per-user scan would need user code.

Scale shape: each stage is (pushed-down event_type filter) → per-user
min aggregate → equi-join to the previous stage's per-user row — every
shuffle keyed on user_id, every aggregate map-side combinable, state
one row per surviving user per stage. No windows, no sorts of the raw
stream. The stage-k relation only shrinks (conversion is monotone), so
later joins get cheaper, and Spark broadcasts them once they fall
under the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, CAST(epoch_us(min(ts)) AS BIGINT) AS t_us
  FROM events WHERE event_type = 'view' GROUP BY 1
),
c AS (
  SELECT e.user_id, CAST(epoch_us(min(e.ts)) AS BIGINT) AS t_us, min(v.t_us) AS prev_us
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND CAST(epoch_us(e.ts) AS BIGINT) > v.t_us
  GROUP BY 1
),
p AS (
  SELECT e.user_id, CAST(epoch_us(min(e.ts)) AS BIGINT) AS t_us, min(c.t_us) AS prev_us
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND CAST(epoch_us(e.ts) AS BIGINT) > c.t_us
  GROUP BY 1
)
SELECT * FROM (
  SELECT 1 AS step, 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users,
         CAST(-1.0 AS DOUBLE) AS avg_gap_s
  FROM v
  UNION ALL
  SELECT 2, 'click', CAST(count(*) AS BIGINT),
         round(avg((t_us - prev_us) / CAST(1000000.0 AS DOUBLE)), 4)
  FROM c
  UNION ALL
  SELECT 3, 'purchase', CAST(count(*) AS BIGINT),
         round(avg((t_us - prev_us) / CAST(1000000.0 AS DOUBLE)), 4)
  FROM p
)
ORDER BY step
"""


@register("rel_funnel_conversion", _FUNNEL_SQL)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion funnel: per stage, the user
    count still converting and the mean seconds since the previous
    stage (-1.0 for the entry stage). Each stage anchors on the FIRST
    qualifying event strictly after the previous stage's anchor."""
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_type"])
    us = F.unix_micros("ts")

    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(us).alias("t_us"))
    )

    def next_stage(prev: DataFrame, event_type: str) -> DataFrame:
        e = ev.where(F.col("event_type") == event_type).select(
            "user_id", us.alias("e_us")
        )
        p = prev.select("user_id", F.col("t_us").alias("p_us"))
        return (
            e.join(p, "user_id")
            .where(F.col("e_us") > F.col("p_us"))
            .groupBy("user_id")
            .agg(F.min("e_us").alias("t_us"), F.min("p_us").alias("prev_us"))
        )

    c = next_stage(v, "click")
    p = next_stage(c, "purchase")

    def stage_row(df: DataFrame, step: int, name: str, with_gap: bool) -> DataFrame:
        if with_gap:
            agg_df = df.agg(
                F.count("*").alias("n_users"),
                F.round(
                    F.avg((F.col("t_us") - F.col("prev_us")) / 1000000.0), 4
                ).alias("avg_gap_s"),
            )
        else:
            agg_df = df.agg(F.count("*").alias("n_users")).withColumn(
                "avg_gap_s", F.lit(-1.0)
            )
        return agg_df.select(
            F.lit(step).alias("step"),
            F.lit(name).alias("stage"),
            "n_users",
            "avg_gap_s",
        )

    return (
        stage_row(v, 1, "view", False)
        .unionAll(stage_row(c, 2, "click", True))
        .unionAll(stage_row(p, 3, "purchase", True))
        .orderBy("step")
    )
