"""Re-aggregatable HLL sketch rollup (operators/hll.py) — staged r12 as
an r13 debut candidate; the registered query will spell exactly this
oracle algebra (the cardinality/GIF staging pattern). The module's
measured engine contract (HIP estimates are insertion-order-dependent,
so merged-vs-whole equality is NOT assertable) is pinned here too."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mapreduce_system_spark.operators.hll import distinct_sketch_rollup

_ROWS = [
    ("d1", 1), ("d1", 1), ("d1", 2), ("d1", None),
    ("d2", 2), ("d2", 3), ("d2", 4),
    (None, 4), (None, 5),
]


def _df(spark):
    return spark.createDataFrame(_ROWS, "grp string, v long")


def test_rollup_exact_counts_and_bands_on_crafted_corpus(spark):
    """Small cardinalities sit in the sketch's exact (coupon) regime, so
    every band boolean must be TRUE and the exact counts match hand
    counting: duplicate values collapse, NULL values drop, a NULL group
    is a group, and the TOTAL row's estimate comes from the MERGE."""
    out = {r.grp: (r.exact, r.within_band) for r in distinct_sketch_rollup(
        _df(spark), "grp", "v").collect()}
    assert out == {
        "d1": (2, True),   # {1, 2}
        "d2": (3, True),   # {2, 3, 4}
        None: (2, True),   # {4, 5}
        "TOTAL": (5, True),  # {1..5}
    }


def test_rollup_empty_input_keeps_the_total_row(spark):
    empty = spark.createDataFrame([], "grp string, v long")
    out = [tuple(r) for r in distinct_sketch_rollup(empty, "grp", "v").collect()]
    assert out == [("TOTAL", 0, True)]
    with pytest.raises(ValueError, match="band"):
        distinct_sketch_rollup(empty, "grp", "v", band=0.0)


def test_rollup_matches_oracle_on_random_corpora(spark):
    """The drafted oracle algebra, fuzzed: exact distincts per group +
    TRUE band literals, NULL-value drop, NULL group kept. Random corpora
    stay in the coupon-exact regime, so TRUE is guaranteed, and a
    semantics drift (NULL handling, group loss, sentinel collision)
    shows as a row diff."""

    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from([None, "g1", "g2", "g3"]),
                st.sampled_from([None, 1, 2, 3, 4, 5, 6]),
            ),
            min_size=0,
            max_size=25,
        )
    )
    @settings(max_examples=8, deadline=None)
    def check(rows):
        df = spark.createDataFrame(rows or [], "grp string, v long")
        got = {r.grp: (r.exact, r.within_band) for r in
               distinct_sketch_rollup(df, "grp", "v").collect()}
        vals = [(g, v) for g, v in rows if v is not None]
        want = {
            g: (len({v for gg, v in vals if gg == g}), True)
            for g in {g for g, _ in vals}
        }
        want["TOTAL"] = (len({v for _, v in vals}), True)
        assert got == want, (rows, got, want)

    check()


def test_rollup_matches_unrolled_duckdb_oracle(spark, tmp_path):
    """Cross-engine parity, drafted as the future registered query's
    oracle will spell it: exact distinct per group, TRUE band literals,
    the TOTAL sentinel row — DuckDB never sees a sketch, which is the
    point of the band-boolean design (agg_approx_distinct pattern)."""
    _df(spark).write.parquet(f"{tmp_path}/t.parquet")
    got = [
        (r.grp, r.exact, r.within_band)
        for r in distinct_sketch_rollup(_df(spark), "grp", "v").collect()
    ]
    want = sorted(
        duckdb.sql(
            f"""
WITH v AS (SELECT grp, v FROM read_parquet('{tmp_path}/t.parquet/*.parquet')
           WHERE v IS NOT NULL)
SELECT grp, CAST(count(DISTINCT v) AS BIGINT) AS exact, TRUE AS within_band
FROM v GROUP BY grp
UNION ALL
SELECT 'TOTAL', CAST(count(DISTINCT v) AS BIGINT), TRUE FROM v
"""
        ).fetchall(),
        key=lambda t: (t[0] is not None, t),
    )
    assert sorted(got, key=lambda t: (t[0] is not None, t)) == want


def test_rollup_band_holds_on_fixture_daily_users(spark):
    """The real shape at fixture scale: daily distinct-user sketches
    over events, merged to the total — 30 groups at sf0.001, band 5%
    (~4x the worst error measured at 10x these cardinalities; the HIP
    order-dependence note in operators/hll.py is why the band, not
    merged==whole equality, is the contract)."""
    from tests.conftest import SF_DIR
    from mapreduce_system_spark.sources.tables import load_table

    ev = load_table(spark, SF_DIR, "events", columns=["user_id", "ts"])
    daily = ev.select(
        F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd").alias("day"),
        "user_id",
    )
    out = distinct_sketch_rollup(daily, "day", "user_id").collect()
    assert len(out) >= 2  # at least one day + TOTAL
    assert all(r.within_band for r in out), [
        (r.grp, r.exact) for r in out if not r.within_band
    ]
    tot = [r for r in out if r.grp == "TOTAL"]
    assert len(tot) == 1 and tot[0].exact > 0


def test_rollup_sentinel_collision_raises(spark):
    """A group value equal to the 'TOTAL' rollup sentinel must raise at
    execution (ADVICE r12) — silently emitting two indistinguishable
    rows would corrupt any consumer keying on the sentinel."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame(
        [("TOTAL", 1), ("d1", 2)], "grp string, v long"
    )
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
        distinct_sketch_rollup(df, "grp", "v").collect()
    assert "rollup sentinel" in str(ei.value)
