"""Relational operators over the star schema.

The reference can *express* all of this through map-tag + shuffle + reduce
(Dean & Ghemawat §2 sketches joins and aggregations as MapReduce programs;
the repo itself ships only the runtime — SURVEY.md §2b marks every
relational row ABSENT as code). Here each shape is a first-class Catalyst
plan: hash/sort-merge/broadcast joins, partial+final aggregation (the
combiner the reference omits, README.MD:31-38), window functions, grouping
sets, set ops.

Scale notes:
- ``broadcast_dim`` joins skip the shuffle entirely for dimension tables
  (region/nation/supplier/part are broadcast-sized at every SF).
- fact-fact joins shuffle on the join key; AQE handles skew splitting.
- ``top_k_per_group`` uses row_number over a partitioned window — one
  shuffle on the group key, no global sort.
- ``top_k_global`` compiles to TakeOrderedAndProject (per-partition heap +
  driver merge), never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def broadcast_dim(fact: DataFrame, dim: DataFrame, on, how: str = "inner") -> DataFrame:
    """Join a fact table to a broadcast-sized dimension (no shuffle)."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — rows of left with a match in right."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — rows of left without a match in right."""
    return left.join(right, on, "left_anti")


def top_k_per_group(df: DataFrame, group_cols: list[str], order_cols: list[Column], k: int) -> DataFrame:
    """Per-group top-k via ranked window; order_cols must be a total order."""
    w = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .withColumn("rn", F.col("rn").cast("long"))
    )


def top_k_global(df: DataFrame, order_cols: list[Column], k: int) -> DataFrame:
    """Global top-k: orderBy+limit → TakeOrderedAndProject (scales)."""
    return df.orderBy(*order_cols).limit(k)


def running_agg(
    df: DataFrame, group_cols: list[str], order_cols: list[Column], value_col: str
) -> DataFrame:
    """Running (cumulative) sum per group — rows unbounded-preceding..current."""
    w = (
        W.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return df.withColumn("running_sum", F.sum(value_col).over(w))


def tagged_op_counts(ops: list[tuple[str, DataFrame]]) -> DataFrame:
    """One (op, cnt) row per named relation — the shared assembly for the
    set-operator cardinality queries (ANSI and bag ALL variants)."""

    def tag(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count("*").alias("cnt")).select(F.lit(name).alias("op"), "cnt")

    out = tag(*ops[0])
    for name, df in ops[1:]:
        out = out.unionByName(tag(name, df))
    return out.orderBy("op")


def set_op_counts(a: DataFrame, b: DataFrame) -> DataFrame:
    """UNION / INTERSECT / EXCEPT cardinalities of two key sets, one row each.

    Distinct semantics (ANSI set operators), tagged by op name. Both
    inputs feed three operators, so they are cached (tracked — harnesses
    release between queries) instead of re-scanning each source 3×.
    """
    from mapreduce_system_spark.caches import tracked_cache

    a = tracked_cache(a)
    b = tracked_cache(b)
    return tagged_op_counts(
        [
            ("union", a.union(b).distinct()),
            ("intersect", a.intersect(b)),
            ("except", a.subtract(b)),
        ]
    )
