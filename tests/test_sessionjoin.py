"""Session-window stream-stream join (streaming/windows.py::
session_join) — staged r17 for an r18+ debut (``stream_session_join``
planned); the registered query will spell the union-timeline
gaps-and-islands oracle drafted here. Pinned: the pure-Python
reference, the BRIDGING property the interval join cannot express
(the operator's reason to exist), cross-side tie handling, the DuckDB
draft on real timestamps, and bad-params rejection."""

from __future__ import annotations

import random
from collections import defaultdict

import duckdb
import pytest

from mapreduce_system_spark.streaming.windows import session_join

_GAP = "10 minutes"
_GAP_S = 600.0


def _ref_pairs(left, right, gap_s):
    """{(key, l_id, r_id, session_id)} — sessions over the merged
    per-key timeline, any gap > gap_s splits, 0-based session ids."""
    by_key: dict = defaultdict(list)
    for k, t, i in left:
        by_key[k].append((t, 0, i))
    for k, t, i in right:
        by_key[k].append((t, 1, i))
    out = set()
    for k, evs in by_key.items():
        evs.sort(key=lambda e: (e[0], e[1]))
        sess, prev = -1, None
        lab: list = []
        for t, side, i in evs:
            if prev is None or t - prev > gap_s:
                sess += 1
            prev = t
            lab.append((sess, side, i))
        for sa, side_a, ia in lab:
            if side_a != 0:
                continue
            for sb, side_b, ib in lab:
                if side_b == 1 and sb == sa:
                    out.add((k, ia, ib, sa))
    return out


def _collect_pairs(df):
    return {
        (r.l_k, r.l_id, r.r_id, r.session_id) for r in df.collect()
    }


def _mk(spark, rows):
    return spark.createDataFrame(rows, "k long, ts double, id long")


def test_matches_reference_on_seeded_streams(spark):
    rng = random.Random(9300)
    left = [
        (rng.randint(0, 5), float(rng.randint(0, 20000)), i)
        for i in range(120)
    ]
    right = [
        (rng.randint(0, 5), float(rng.randint(0, 20000)), 1000 + i)
        for i in range(120)
    ]
    got = _collect_pairs(
        session_join(_mk(spark, left), _mk(spark, right), "k", "ts", "ts", _GAP)
    )
    assert got == _ref_pairs(left, right, _GAP_S)


def test_bridging_beats_interval_join(spark):
    """The defining property: a left and right event farther apart than
    the gap still join when intermediate activity bridges the session;
    remove the bridge and the session splits."""
    left = [(1, 0.0, 10)]
    right = [(1, 1000.0, 20)]               # ~17 min later (> 10-min gap)
    bridge = [(1, 500.0, 30)]               # keeps the session alive
    with_bridge = _collect_pairs(
        session_join(
            _mk(spark, left), _mk(spark, right + bridge), "k", "ts", "ts", _GAP
        )
    )
    assert (1, 10, 20, 0) in with_bridge
    without = _collect_pairs(
        session_join(_mk(spark, left), _mk(spark, right), "k", "ts", "ts", _GAP)
    )
    assert not without  # ~17-min silence > 10-min gap: different sessions
    # the bridge itself joined too, same session
    assert (1, 10, 30, 0) in with_bridge


def test_cross_side_ties_share_a_session(spark):
    """Equal timestamps across sides can never split (gap 0 never
    starts a session), whatever the tie order; and a boundary tie
    lands wholly in the NEW session."""
    left = [(1, 100.0, 1), (1, 5000.0, 2)]
    right = [(1, 100.0, 11), (1, 5000.0, 12)]
    got = _collect_pairs(
        session_join(_mk(spark, left), _mk(spark, right), "k", "ts", "ts", _GAP)
    )
    assert got == {(1, 1, 11, 0), (1, 2, 12, 1)}


def test_exact_gap_still_merges_strictly_greater_splits(spark):
    left = [(1, 0.0, 1)]
    right = [(1, 600.0, 11), (1, 1200.000001, 12)]
    got = _collect_pairs(
        session_join(_mk(spark, left), _mk(spark, right), "k", "ts", "ts", _GAP)
    )
    # 600 == gap merges; the next event sits 600.000001 after -> splits
    assert got == {(1, 1, 11, 0)}


def test_matches_duckdb_oracle_draft_on_timestamps(spark, tmp_path):
    """The union-timeline algebra the planned ``stream_session_join``
    will interpolate, on real TIMESTAMP columns (Spark cast-to-double
    == DuckDB epoch())."""
    rng = random.Random(9310)
    base = 1_700_000_000
    lrows = [
        (rng.randint(0, 4), base + rng.randint(0, 30000), i) for i in range(80)
    ]
    rrows = [
        (rng.randint(0, 4), base + rng.randint(0, 30000), 500 + i)
        for i in range(80)
    ]
    ldf = spark.createDataFrame(
        lrows, "k long, es long, id long"
    ).selectExpr("k", "CAST(es AS TIMESTAMP) AS ts", "id")
    rdf = spark.createDataFrame(
        rrows, "k long, es long, id long"
    ).selectExpr("k", "CAST(es AS TIMESTAMP) AS ts", "id")
    ldf.write.parquet(f"{tmp_path}/l.parquet")
    rdf.write.parquet(f"{tmp_path}/r.parquet")
    got = sorted(
        (r.l_k, r.l_id, r.r_id, r.session_id)
        for r in session_join(ldf, rdf, "k", "ts", "ts", _GAP).collect()
    )
    sql = f"""
WITH u AS (
  SELECT k, epoch(ts) AS t, 0 AS side, id AS lid, NULL::BIGINT AS rid
  FROM read_parquet('{tmp_path}/l.parquet/*.parquet')
  WHERE k IS NOT NULL AND ts IS NOT NULL
  UNION ALL
  SELECT k, epoch(ts), 1, NULL, id
  FROM read_parquet('{tmp_path}/r.parquet/*.parquet')
  WHERE k IS NOT NULL AND ts IS NOT NULL
),
s AS (
  SELECT *, lag(t) OVER (PARTITION BY k ORDER BY t, side) AS prev FROM u
),
g AS (
  SELECT *,
         sum(CASE WHEN prev IS NULL OR t - prev > {_GAP_S!r} THEN 1 ELSE 0 END)
           OVER (PARTITION BY k ORDER BY t, side
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
           AS sess
  FROM s
)
SELECT a.k, a.lid AS l_id, b.rid AS r_id, CAST(a.sess AS BIGINT) AS session_id
FROM g a JOIN g b ON a.k = b.k AND a.sess = b.sess
WHERE a.side = 0 AND b.side = 1
ORDER BY 1, 2, 3
"""
    want = sorted(tuple(r) for r in duckdb.connect().execute(sql).fetchall())
    assert got == want


def test_rejects_bad_gap(spark):
    df = _mk(spark, [(1, 0.0, 1)])
    with pytest.raises(ValueError, match="gap"):
        session_join(df, df, "k", gap="0 minutes")
