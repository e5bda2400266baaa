"""Physical-plan guards for the scale-critical operators.

The 100 TB property of the dedup/similarity/streaming-join plans is that
candidates come from EQUI-joins — if a refactor degrades one to a
cartesian/nested-loop shape it would still pass value checks at fixture
scale while becoming O(n²) at real scale. These tests pin the plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_system_spark.operators import dedup as DD
from mapreduce_system_spark.plans.checks import formatted_plan
from mapreduce_system_spark.sources.tables import load_table
from mapreduce_system_spark.streaming.windows import interval_join
from tests.conftest import SF_DIR

_ALL_PAIRS_OPS = ("CartesianProduct", "BroadcastNestedLoopJoin")


def _assert_equi_join_only(df):
    plan = formatted_plan(df)
    for op in _ALL_PAIRS_OPS:
        assert op not in plan, f"{op} in plan:\n{plan}"


def test_jaccard_pairs_has_no_all_pairs_join(spark):
    docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
    _assert_equi_join_only(DD.jaccard_pairs(docs, max_shingle_df=100))


def test_minhash_lsh_has_no_all_pairs_join(spark):
    docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
    _assert_equi_join_only(DD.minhash_lsh_pairs(docs))


def test_simhash_pairs_has_no_all_pairs_join(spark):
    docs = load_table(spark, SF_DIR, "documents", columns=["doc_id", "text"])
    _assert_equi_join_only(DD.simhash_pairs(docs))


def test_interval_join_is_equi_join_on_key(spark):
    ev = load_table(spark, SF_DIR, "events", columns=["ts", "user_id", "event_type"])
    clicks = ev.where(F.col("event_type") == "click").select("user_id", "ts")
    purchases = ev.where(F.col("event_type") == "purchase").select("user_id", "ts")
    _assert_equi_join_only(interval_join(clicks, purchases, on="user_id"))
