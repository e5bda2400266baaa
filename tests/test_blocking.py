"""Sorted-neighborhood blocking (operators/blocking.py) — staged r16
for an r17+ debut (``dedup_sorted_neighborhood`` planned); the
registered query will spell the single-window oracle drafted here (the
oracle CAN afford the textbook form; the operator exists because Spark
at scale cannot). Pinned: the pure-Python reference, the
partitioning-invariance law the offset-stitch design exists for, the
exact candidate-volume bound, and the DuckDB draft."""

from __future__ import annotations

import random

import duckdb
import pytest

from mapreduce_system_spark import caches
from mapreduce_system_spark.operators.blocking import (
    global_sort_positions,
    sorted_neighborhood_pairs,
)


@pytest.fixture(autouse=True)
def _release_tracked_caches():
    # global_sort_positions caches its pid-stamped exchange (the
    # two-reader consistency fix); drop the blocks after every test
    yield
    caches.release()


def _ref_pairs(rows, window):
    ord_rows = sorted(
        ((k, i) for i, k in rows if i is not None and k is not None)
    )
    out = set()
    for a in range(len(ord_rows)):
        for b in range(a + 1, min(a + window, len(ord_rows))):
            out.add((ord_rows[a][1], ord_rows[b][1]))
    return out


def test_positions_match_total_order(spark):
    rows = [(i, f"k{(i * 7) % 23:02d}") for i in range(60)] + [
        (None, "kx"), (99, None)
    ]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {
        r.id: r.pos
        for r in global_sort_positions(df, "id", "key", num_partitions=7).collect()
    }
    want_order = sorted((k, i) for i, k in rows if i is not None and k is not None)
    want = {i: p for p, (_, i) in enumerate(want_order)}
    assert got == want


def test_pairs_match_reference_and_volume_bound(spark):
    rng = random.Random(1651)
    rows = [(i, f"key-{rng.randint(0, 40):03d}") for i in range(120)]
    df = spark.createDataFrame(rows, "id long, key string")
    for window in (2, 3, 5):
        got = {
            (r.id_a, r.id_b)
            for r in sorted_neighborhood_pairs(
                df, "id", "key", window=window, num_partitions=5
            ).collect()
        }
        assert got == _ref_pairs(rows, window)
        # exact candidate volume: n*(w-1) minus the truncated tail
        n = len(rows)
        assert len(got) == n * (window - 1) - (window - 1) * window // 2


def test_partitioning_invariance(spark):
    """The offset-stitch design's whole claim: the pair set is a pure
    function of the data — partition count and input layout cannot
    move it."""
    rows = [(i, f"key-{(i * 13) % 31:02d}") for i in range(200)]
    df = spark.createDataFrame(rows, "id long, key string")
    base = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(df, "id", "key", window=4).collect()
    }
    for np_ in (1, 3, 17):
        for src in (df.repartition(11), df.coalesce(1)):
            got = {
                (r.id_a, r.id_b)
                for r in sorted_neighborhood_pairs(
                    src, "id", "key", window=4, num_partitions=np_
                ).collect()
            }
            assert got == base, (np_,)


def test_matches_duckdb_oracle_draft(spark, tmp_path):
    """The draft the planned ``dedup_sorted_neighborhood`` will
    interpolate: the textbook single-window spelling — positions via
    one row_number, pairs via a positional self-join."""
    rng = random.Random(1652)
    rows = [(i, f"p{rng.randint(0, 50):03d}") for i in range(150)]
    df = spark.createDataFrame(rows, "id long, key string")
    df.write.parquet(f"{tmp_path}/recs.parquet")
    window = 3
    got = sorted(
        (r.id_a, r.id_b, r.pos_a, r.pos_b)
        for r in sorted_neighborhood_pairs(df, "id", "key", window=window).collect()
    )
    sql = f"""
WITH pos AS (
  SELECT id, key,
         row_number() OVER (ORDER BY key, id) - 1 AS pos
  FROM read_parquet('{tmp_path}/recs.parquet/*.parquet')
  WHERE id IS NOT NULL AND key IS NOT NULL
)
SELECT a.id AS id_a, b.id AS id_b, a.pos AS pos_a, b.pos AS pos_b
FROM pos a JOIN pos b
  ON b.pos - a.pos >= 1 AND b.pos - a.pos < {window}
ORDER BY 1, 2
"""
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_near_keys_pair_where_content_blocking_cannot(spark):
    """The operator's reason to exist: key-adjacent records with ZERO
    shared tokens/shingles still become candidates."""
    rows = [
        (1, "smith j 0001"),
        (2, "smith j 001"),   # zero-pad variant — no 4-gram in common
        (3, "zzz unrelated"),
    ]
    df = spark.createDataFrame(rows, "id long, key string")
    got = {
        (r.id_a, r.id_b)
        for r in sorted_neighborhood_pairs(df, "id", "key", window=2).collect()
    }
    assert (2, 1) in got or (1, 2) in got


def test_rejects_bad_window(spark):
    df = spark.createDataFrame([(1, "a")], "id long, key string")
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_pairs(df, "id", "key", window=1)
