"""MERGE-upsert sink: convergence, idempotent replay, partition-scoped
rewrites (sources/merge.py — the write side of rel_cdc_latest_state)."""

from __future__ import annotations

import datetime as dt
from pathlib import Path

from pyspark.sql import functions as F

from mapreduce_system_spark.sources.merge import merge_upsert, read_latest


def _ts(day: int):
    return dt.datetime(2024, 1, day, 12, 0, 0)


def _changelog(spark, rows):
    return spark.createDataFrame(
        rows, ["event_id", "ts", "user_id", "event_type", "value"]
    )


_B1 = [
    (1, _ts(1), 10, "open", 1.0),
    (2, _ts(3), 10, "close", 2.0),
    (3, _ts(2), 20, "open", 3.0),
]
_B2 = [
    (4, _ts(2), 10, "pay", 9.0),   # older than user 10's close — must lose
    (5, _ts(5), 20, "close", 4.0),  # newer — must win
    (6, _ts(1), 30, "open", 5.0),   # new key
]
_EXPECTED = {
    10: (_ts(3), "close", 2.0),
    20: (_ts(5), "close", 4.0),
    30: (_ts(1), "open", 5.0),
}


def _state(spark, path):
    return {
        r.user_id: (r.ts, r.event_type, r.value)
        for r in read_latest(spark, path).collect()
    }


def _apply(spark, path, rows):
    merge_upsert(
        spark, path, _changelog(spark, rows),
        key_cols=["user_id"], order_cols=["ts", "event_id"], n_buckets=4,
    )


def test_merge_upsert_converges_to_latest_state(spark, tmp_path):
    p = str(tmp_path / "sink")
    _apply(spark, p, _B1)
    _apply(spark, p, _B2)
    assert _state(spark, p) == _EXPECTED


def test_merge_upsert_replay_is_idempotent(spark, tmp_path):
    """Crash recovery contract: re-applying an already-applied batch
    leaves the state bit-identical."""
    p = str(tmp_path / "sink")
    _apply(spark, p, _B1)
    _apply(spark, p, _B2)
    _apply(spark, p, _B2)  # replay
    assert _state(spark, p) == _EXPECTED
    _apply(spark, p, _B1)  # replay an OLD batch — still no regression
    assert _state(spark, p) == _EXPECTED


def test_merge_upsert_is_batch_order_independent(spark, tmp_path):
    p = str(tmp_path / "sink")
    _apply(spark, p, _B2)
    _apply(spark, p, _B1)
    assert _state(spark, p) == _EXPECTED


def test_merge_upsert_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100 TB property: a batch rewrites the bucket partitions its
    keys hash to and leaves every other partition's files untouched."""
    p = str(tmp_path / "sink")
    _apply(spark, p, _B1)
    buckets_before = {
        d.name: sorted(f.name for f in d.iterdir())
        for d in Path(p).glob("__bucket=*")
    }
    # single-key batch → touches exactly one bucket
    _apply(spark, p, [(7, _ts(9), 10, "reopen", 7.0)])
    touched = {
        r[0]
        for r in spark.createDataFrame([(10,)], ["user_id"])
        .select(F.pmod(F.hash("user_id"), F.lit(4)))
        .collect()
    }
    buckets_after = {
        d.name: sorted(f.name for f in d.iterdir())
        for d in Path(p).glob("__bucket=*")
    }
    for name, files in buckets_before.items():
        bucket_id = int(name.split("=")[1])
        if bucket_id not in touched:
            assert buckets_after[name] == files, name
    assert _state(spark, p)[10] == (_ts(9), "reopen", 7.0)


def test_merge_upsert_single_batch_equals_compaction(spark, tmp_path):
    p = str(tmp_path / "sink")
    _apply(spark, p, _B1 + _B2)
    assert _state(spark, p) == _EXPECTED


def test_merge_upsert_uri_scheme_sink_keeps_unmatched_keys(spark, tmp_path):
    """A URI-style sink path (file:) must behave exactly like the plain
    local path: the sink-exists probe goes through the Hadoop FileSystem
    API, so the second merge sees the first batch's state. With the old
    local-only Path.glob probe, 'file:/...' looked absent and the second
    merge silently DELETED every key of the touched buckets that was not
    in the new batch."""
    sink = f"file:{tmp_path}/merge-uri"
    merge_upsert(spark, sink, _changelog(spark, _B1), ["user_id"], ["ts"])
    merge_upsert(spark, sink, _changelog(spark, _B2), ["user_id"], ["ts"])
    assert _state(spark, sink) == _EXPECTED


def test_merge_upsert_glob_metachar_sink_keeps_unmatched_keys(spark, tmp_path):
    """A sink path containing glob metacharacters must behave exactly
    like a plain path: the sink-exists probe lists the directory
    literally (listStatus), so the second merge sees the first batch's
    state. With the old globStatus probe, '[v2]' parsed as a character
    class, the existing sink looked absent, and the second merge
    silently DELETED every key of the touched buckets that was not in
    the new batch."""
    p = str(tmp_path / "sink[v2]*{a}")
    _apply(spark, p, _B1)
    _apply(spark, p, _B2)
    assert _state(spark, p) == _EXPECTED
