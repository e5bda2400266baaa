"""Scalar math / schema-free-JSON function queries (window-rotation split).

Physically split from ``temporal.py`` for the r10 driver-window rotation
only: these two queries carry fresh r09 driver rows and UNCHANGED code,
so they sit outside the first-50 window while temporal.py's r06-stale
cohort (plus the TRY_CAST-hardened ``fn_json_props`` oracle) rotates in.
Same conventions and citations as temporal.py (reference README.MD:82
generic-UDF surface re-expressed as JVM scalar expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table


# Math scalar surface: each expression must agree to 6 decimals after the
# identical formula on both engines (ln/sqrt/exp/pow/abs/sign/floor/ceil
# over the lineitem price columns).
_MATH_SQL = """
WITH m AS (
  SELECT l_returnflag,
         sqrt(l_extendedprice) AS sq,
         ln(l_extendedprice + 1.0) AS lg,
         exp(l_discount) AS ex,
         pow(1.0 + l_tax, 2) AS pw,
         abs(l_extendedprice - l_quantity * 1000.0) AS ab,
         sign(l_extendedprice - l_quantity * 1000.0) AS sg,
         floor(l_extendedprice / 100.0) AS fl,
         ceil(l_extendedprice / 100.0) AS ce
  FROM lineitem
)
SELECT l_returnflag,
       round(avg(sq), 6) AS avg_sqrt,
       round(avg(lg), 6) AS avg_log,
       round(avg(ex), 6) AS avg_exp,
       round(avg(pw), 6) AS avg_pow,
       round(avg(ab), 4) AS avg_abs,
       CAST(sum(sg) AS BIGINT) AS sum_sign,
       CAST(sum(fl) AS BIGINT) AS sum_floor,
       CAST(sum(ce) AS BIGINT) AS sum_ceil
FROM m
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@register("fn_math_scalar_profile", _MATH_SQL)
def q_math_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar-function surface (sqrt/ln/exp/pow/abs/sign/floor/ceil)
    over the lineitem measures — pure JVM column expressions inside one
    codegen stage, aggregated per return flag."""
    li = load_table(
        spark, sf_dir, "lineitem",
        columns=["l_returnflag", "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    )
    diff = F.col("l_extendedprice") - F.col("l_quantity") * 1000.0
    m = li.select(
        "l_returnflag",
        F.sqrt("l_extendedprice").alias("sq"),
        F.log(F.col("l_extendedprice") + 1.0).alias("lg"),
        F.exp("l_discount").alias("ex"),
        F.pow(F.lit(1.0) + F.col("l_tax"), 2).alias("pw"),
        F.abs(diff).alias("ab"),
        F.signum(diff).alias("sg"),
        F.floor(F.col("l_extendedprice") / 100.0).alias("fl"),
        F.ceil(F.col("l_extendedprice") / 100.0).alias("ce"),
    )
    return (
        m.groupBy("l_returnflag")
        .agg(
            F.round(F.avg("sq"), 6).alias("avg_sqrt"),
            F.round(F.avg("lg"), 6).alias("avg_log"),
            F.round(F.avg("ex"), 6).alias("avg_exp"),
            F.round(F.avg("pw"), 6).alias("avg_pow"),
            F.round(F.avg("ab"), 4).alias("avg_abs"),
            F.sum("sg").cast("long").alias("sum_sign"),
            F.sum("fl").cast("long").alias("sum_floor"),
            F.sum("ce").cast("long").alias("sum_ceil"),
        )
        .orderBy("l_returnflag")
    )


# json_valid guard: DuckDB's json_extract_string VALIDATES its input and
# aborts the whole query on a malformed props string, where Spark's
# from_json nulls just that row — the CASE makes malformed rows NULL on
# both engines (caught by tests/test_adversarial_corpus.py; fixture
# props are all well-formed, so fixture hashes are unchanged)
_JSON_MAP_SQL = """
WITH p AS (
  SELECT event_type,
         CASE WHEN json_valid(props) THEN props END AS props
  FROM events
)
SELECT event_type,
       count(*) AS cnt,
       CAST(count(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS with_k,
       CAST(sum(TRY_CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
FROM p
GROUP BY event_type
ORDER BY event_type
"""


@register("fn_json_map_props", _JSON_MAP_SQL)
def q_json_map_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-free JSON parsing: props → MapType + element_at — the
    dynamic-payload path when keys aren't known ahead (vs the typed-struct
    path in fn_json_props).

    Parsed as map<string,string> with a per-VALUE cast afterwards: a
    map<string,int> parse nulls the ENTIRE map when any one value isn't
    an int (so one heterogeneous key would blank every other key too,
    diverging from the oracle's per-path json_extract); the string map
    keeps unrelated keys intact and the cast nulls only the non-numeric
    value itself. The per-value cast is try_cast — Spark 4 runs ANSI by
    default, so a plain cast would ABORT the query on the first
    non-numeric value instead of nulling it (the documented contract);
    the oracle's TRY_CAST(json_extract_string ...) has the identical
    per-value semantics, including parsing a string-encoded '"5"'."""
    ev = load_table(spark, sf_dir, "events", columns=["event_type", "props"])
    m = F.from_json("props", "map<string,string>")
    return (
        ev.select("event_type", F.element_at(m, "k").try_cast("int").alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.count("k").alias("with_k"),
            F.sum("k").alias("sum_k"),
        )
        .orderBy("event_type")
    )
