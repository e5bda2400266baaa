"""Mergeable histogram sketch rollup (operators/histsketch.py) — staged
r14 for an r15 registration; the registered query will spell exactly the
oracle algebra drafted here (the hll/cardinality/lpa staging pattern).
Parity is pinned against an independent pure-Python reference AND the
DuckDB CTE draft."""

from __future__ import annotations

import math

import duckdb
import pytest

from mapreduce_system_spark.operators.histsketch import histogram_sketch_rollup

_LO, _HI, _BINS = 0.0, 100.0, 10  # w = 10.0

_ROWS = [
    # (grp, v) — duplicates, NULLs, a NULL group, edge values, clamps
    ("a", 5.0), ("a", 5.0), ("a", 15.0), ("a", 35.0), ("a", 99.9),
    ("b", 0.0), ("b", 100.0),           # lo lands in bin 0; hi in top bin
    ("b", 50.0), ("b", 51.0), ("b", 52.0),
    (None, 10.0), (None, 90.0),         # NULL group is a group
    ("c", -7.0), ("c", 250.0),          # clamped outliers (edge bins)
    ("a", None), (None, None),          # NULL values ignored
]


def _ref(rows, lo, hi, bins, q):
    """Independent reference: bin counts -> interpolated estimate;
    type-1 exact."""
    w = (hi - lo) / bins
    by: dict = {}
    for g, v in rows:
        if v is None:
            continue
        by.setdefault(g, []).append(float(v))
    by["TOTAL"] = [v for g in by for v in by[g]]
    out = {}
    for g, vs in by.items():
        n = len(vs)
        cnts = [0] * bins
        for v in vs:
            b = min(bins - 1, max(0, math.floor((v - lo) / w)))
            cnts[int(b)] += 1
        t = q * n
        cum = 0
        for b, c in enumerate(cnts):
            if c and cum + c >= t:
                est = lo + w * (b + (t - cum) / c)
                break
            cum += c
        rank = max(1, math.ceil(t))
        exact = sorted(vs)[rank - 1]
        out[g] = (n, round(est, 6), round(exact, 6), abs(est - exact) <= w)
    return out


@pytest.mark.parametrize("q", [0.0, 0.5, 0.9, 1.0])
def test_histsketch_matches_pure_python_reference(spark, q):
    df = spark.createDataFrame(_ROWS, "grp string, v double")
    got = {
        r.grp: (r.n, r.est_q, r.exact_q, r.within_bin)
        for r in histogram_sketch_rollup(
            df, "grp", "v", _LO, _HI, bins=_BINS, quantile=q
        ).collect()
    }
    want = _ref(_ROWS, _LO, _HI, _BINS, q)
    assert got == want
    # within_bin is an INVARIANT for in-domain groups (a/b and NULL);
    # the clamp group c may break it — that is the clamp telling on
    # itself, not an error
    for g in ("a", "b", None):
        assert got[g][3] is True, (q, g, got[g])


def test_histsketch_total_equals_flat_rollup(spark):
    """The TOTAL row (merged per-group sketches) must equal the sketch
    built over the whole relation in one shot — the exact-mergeability
    contract that distinguishes this from the HLL's banded HIP."""
    df = spark.createDataFrame(_ROWS, "grp string, v double")
    merged = {
        r.grp: (r.n, r.est_q, r.exact_q)
        for r in histogram_sketch_rollup(
            df, "grp", "v", _LO, _HI, bins=_BINS, quantile=0.5
        ).collect()
    }["TOTAL"]
    onegroup = {
        r.grp: (r.n, r.est_q, r.exact_q)
        for r in histogram_sketch_rollup(
            df.selectExpr("'x' AS grp", "v"), "grp", "v",
            _LO, _HI, bins=_BINS, quantile=0.5,
        ).collect()
    }["x"]
    assert merged == onegroup


def test_histsketch_rejects_sentinel_group_and_bad_domain(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors import SparkRuntimeException

    df = spark.createDataFrame([("TOTAL", 1.0)], "grp string, v double")
    with pytest.raises((SparkRuntimeException, Py4JJavaError)) as ei:
        histogram_sketch_rollup(df, "grp", "v", 0.0, 10.0).collect()
    assert "rollup sentinel" in str(ei.value)
    ok = spark.createDataFrame([("a", 1.0)], "grp string, v double")
    with pytest.raises(ValueError, match="lo < hi"):
        histogram_sketch_rollup(ok, "grp", "v", 5.0, 5.0)
    with pytest.raises(ValueError, match="bins"):
        histogram_sketch_rollup(ok, "grp", "v", 0.0, 1.0, bins=0)
    with pytest.raises(ValueError, match="quantile"):
        histogram_sketch_rollup(ok, "grp", "v", 0.0, 1.0, quantile=1.5)


def test_histsketch_matches_duckdb_oracle_draft(spark, tmp_path):
    """The oracle algebra the r15 query will interpolate: (grp, v)
    counts -> clamped bins -> grouping-sets-free union of per-group and
    TOTAL sketches -> cumulative window estimate + type-1 exact."""
    df = spark.createDataFrame(_ROWS, "grp string, v double")
    df.write.parquet(f"{tmp_path}/t.parquet")
    # key=repr: the NULL group makes plain tuple ordering a TypeError
    got = sorted(
        (
            (r.grp, r.n, r.est_q, r.exact_q, r.within_bin)
            for r in histogram_sketch_rollup(
                df, "grp", "v", _LO, _HI, bins=_BINS, quantile=0.5
            ).collect()
        ),
        key=repr,
    )
    q, lo, w, bins = 0.5, 0.0, 10.0, 10
    sql = f"""
WITH base AS (
  SELECT grp, CAST(v AS DOUBLE) AS v
  FROM read_parquet('{tmp_path}/t.parquet/*.parquet') WHERE v IS NOT NULL
), vc AS (
  SELECT grp, v, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY 1, 2
), allvc AS (
  SELECT grp, v, c FROM vc
  UNION ALL
  SELECT 'TOTAL' AS grp, v, CAST(sum(c) AS BIGINT) AS c FROM vc GROUP BY 2
), counts AS (
  SELECT grp,
         least({bins - 1}, greatest(0,
           CAST(floor((v - {lo}) / {w}) AS INT))) AS b,
         CAST(sum(c) AS BIGINT) AS cnt
  FROM allvc GROUP BY 1, 2
), cum AS (
  SELECT grp, b, cnt,
         sum(cnt) OVER (PARTITION BY grp ORDER BY b) - cnt AS cum_before,
         sum(cnt) OVER (PARTITION BY grp) AS n
  FROM counts
), est AS (
  SELECT grp, CAST(n AS BIGINT) AS n,
         {lo} + {w} * (CAST(b AS DOUBLE)
           + (CAST(n AS DOUBLE) * {q} - CAST(cum_before AS DOUBLE))
             / CAST(cnt AS DOUBLE)) AS est_raw,
         row_number() OVER (PARTITION BY grp ORDER BY b) AS rn
  FROM cum
  WHERE CAST(cum_before + cnt AS DOUBLE) >= CAST(n AS DOUBLE) * {q}
), vcum AS (
  SELECT grp, v,
         sum(c) OVER (PARTITION BY grp ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY grp) AS nn
  FROM allvc
), exact AS (
  SELECT grp, v AS exact_raw,
         row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
  FROM vcum
  WHERE cum >= greatest(1, CAST(ceil(CAST(nn AS DOUBLE) * {q}) AS BIGINT))
)
SELECT e.grp, e.n, round(e.est_raw, 6) AS est_q,
       round(x.exact_raw, 6) AS exact_q,
       abs(e.est_raw - x.exact_raw) <= {w} AS within_bin
FROM est e JOIN exact x ON e.grp IS NOT DISTINCT FROM x.grp
WHERE e.rn = 1 AND x.rn = 1
ORDER BY e.grp
"""
    want = sorted(
        (tuple(r) for r in duckdb.connect().execute(sql).fetchall()), key=repr
    )
    assert got == want
