"""Partitioned-sink round trip: value preservation AND partition pruning.

The pruning assertion is the point — a re-scan that lists all 5 priority
directories for a 2-priority filter would silently read 2.5× the bytes at
100 TB. PartitionFilters (not PushedFilters) is where a partition-column
predicate must land.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_system_spark.plans.checks import formatted_plan
from mapreduce_system_spark.queries.sinks import (
    _PRIORITIES,
    partitioned_sink_path,
    q_sink_partitioned_roundtrip,
)
from mapreduce_system_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_bucketed_join_query_staging_joins_with_zero_exchange(spark):
    """The registered bucketed round trip must actually deliver the
    co-located property: after its staging, the bare orderkey join of the
    two catalog tables plans with NO Exchange node at all."""
    from mapreduce_system_spark.queries.sinks import bucketed_tables

    a, b = bucketed_tables(spark, SF_DIR)
    try:
        # the fixture fits under the broadcast threshold; at real fact-fact
        # scale broadcast is off the table, so pin the SMJ path to observe
        # the bucket layout doing the shuffle's job
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = formatted_plan(a.join(b, "o_orderkey"))
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_roundtrip_matches_direct_aggregate(spark):
    got = {
        (r["o_orderpriority"], r["o_orderstatus"]): (r["n_orders"], r["revenue"])
        for r in q_sink_partitioned_roundtrip(spark, SF_DIR).collect()
    }
    direct = {
        (r["o_orderpriority"], r["o_orderstatus"]): (r["n"], r["rev"])
        for r in (
            load_table(spark, SF_DIR, "orders")
            .where(F.col("o_orderpriority").isin(*_PRIORITIES))
            .groupBy("o_orderpriority", "o_orderstatus")
            .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("rev"))
            .collect()
        )
    }
    assert got == direct and got


def test_rescan_prunes_partitions(spark):
    # build the plan over the already-written sink dir (the round-trip test
    # above ran first and staged it)
    q_sink_partitioned_roundtrip(spark, SF_DIR)
    back = spark.read.parquet(partitioned_sink_path(SF_DIR, spark)).where(
        F.col("o_orderpriority").isin(*_PRIORITIES)
    )
    plan = formatted_plan(back.groupBy("o_orderstatus").count())
    # partition-column predicate must be a PartitionFilters entry on the scan
    seg = plan.split("PartitionFilters: [", 1)
    assert len(seg) == 2 and not seg[1].startswith("]"), plan


def test_orc_scan_pushes_down_filters(spark):
    """The ORC reader must accept predicate pushdown like parquet — a
    format swap that silently dropped pushdown would read every stripe
    at scale."""
    from mapreduce_system_spark.queries.sinks import q_scan_orc_roundtrip

    # stage the ORC copy via the query itself, then re-read with a filter
    q_scan_orc_roundtrip(spark, SF_DIR).collect()
    app = spark.sparkContext.applicationId
    from pathlib import Path as P

    path = f"/tmp/spark_graft_orc_{P(SF_DIR).name}_{app}"
    df = spark.read.orc(path).where(F.col("c_acctbal") > 1000.0)
    plan = formatted_plan(df)
    assert "PushedFilters: [" in plan and "c_acctbal" in plan.split("PushedFilters")[1][:120], plan


def test_dpp_query_plans_dynamic_pruning(spark):
    """The registered DPP query must actually plan the runtime pruning
    subquery on the fact scan — without it the query still returns the
    right rows while scanning every partition."""
    import shutil

    from mapreduce_system_spark.plans.checks import formatted_plan
    from mapreduce_system_spark.queries.sinks import dpp_pruned_totals

    df, base = dpp_pruned_totals(spark, SF_DIR)
    try:
        assert "dynamicpruningexpression" in formatted_plan(df)
    finally:
        shutil.rmtree(base, ignore_errors=True)
