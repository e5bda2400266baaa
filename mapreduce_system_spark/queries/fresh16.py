"""Round-16 registration, third batch (the probe-first same-round
pattern fresh15 just used): the r16-staged Count-Min sketch, registered
with DATA-CHOSEN constants after its probe ran green
(bench_runs/scale_probe_r16_cms.json) and its staging tests pinned the
pure-Python reference + oracle draft (tests/test_cmsketch.py).
Registered PAST the r16 window; it joins the fresh14/fresh15 pairs in
the ledgered r17 window lead.

The round's OTHER staged operator, deterministic weighted sampling
(operators/sampling.py, tests/test_sampling.py, --wsample probe), is
deliberately NOT registered: registration review found the catalog
already carries the A-ES surface — ``pipe_weighted_sample``
(queries/fresh7f.py, r7) draws documents by u^(1/w) over the same md5
uniform. The operator module stands as the REUSABLE generalization
(log-space scores that survive extreme weights, the per-epoch ``salt``
re-key, the TakeOrdered plan guard) with its own tests and probe; a
second registration of the same answer would have been catalog padding.
The collision surfaced as a SILENT dict overwrite — registry.register
now raises on duplicate names so import order can never decide which
implementation answers to a name again.

- ``agg_cms_heavy_hitters`` — the Count-Min sketch's audit query: every
  distinct document token's exact count vs its CMS point estimate, with
  ``overcount = est - exact`` shipped as data (one-sided by
  construction: never negative, and est == 0 would prove absence).
  Constants chosen with data: at the operator's 2048-wide default the
  31-token fixture vocabulary never collides (the --cms probe measured
  overcount 0 — a green row would verify hashing but not the MIN-OVER-
  ROWS estimate path), so the registration runs w=32, d=3, where the
  deterministic md5 cell map puts EXACTLY 9 of 31 tokens in all-rows
  collision (nonzero overcount) and 22 in at-least-one-clean-row
  (overcount 0) — both estimate classes exercised, both pinned by the
  full-value oracle.
Reference contrast: worker.go:104-165's one-shot map→reduce IS the
exact count the CMS audit compares against — but the estimate side
joins a SECOND key set against the d*w-bounded reduced output, a
reduce-of-reduces the one-shot pipeline cannot express.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.functions import text as TXT
from mapreduce_system_spark.operators.cmsketch import cms_build, cms_estimate
from mapreduce_system_spark.queries._textshared import _TOKS, _docs
from mapreduce_system_spark.registry import register

# ---------------------------------------------------------------------------
# agg_cms_heavy_hitters — Count-Min estimate vs exact, overcount audit
# ---------------------------------------------------------------------------

_CMS_W, _CMS_D = 32, 3  # data-chosen: 9/31 tokens collide on ALL rows

_CMS_RS = " UNION ALL ".join(f"SELECT {r} AS r" for r in range(_CMS_D))

_CMS_SQL = rf"""
WITH tok AS (
  SELECT unnest({_TOKS}) AS tok FROM documents WHERE text IS NOT NULL
),
rs AS ({_CMS_RS}),
sketch AS (
  SELECT r,
         ('0x' || substr(md5(tok || ':' || r), 1, 8))::UBIGINT % {_CMS_W} AS pos,
         count(*)::BIGINT AS cnt
  FROM tok CROSS JOIN rs
  GROUP BY 1, 2
),
exact AS (SELECT tok, count(*)::BIGINT AS exact_cnt FROM tok GROUP BY 1),
cells AS (
  SELECT e.tok, rs.r,
         ('0x' || substr(md5(e.tok || ':' || rs.r), 1, 8))::UBIGINT % {_CMS_W} AS pos
  FROM exact e CROSS JOIN rs
),
est AS (
  SELECT c.tok, min(coalesce(s.cnt, 0)) AS est_cnt
  FROM cells c LEFT JOIN sketch s ON s.r = c.r AND s.pos = c.pos
  GROUP BY 1
)
SELECT e.tok AS token,
       e.exact_cnt,
       CAST(x.est_cnt AS BIGINT) AS est_cnt,
       CAST(x.est_cnt - e.exact_cnt AS BIGINT) AS overcount
FROM exact e JOIN est x USING (tok)
ORDER BY token
"""


@register("agg_cms_heavy_hitters", _CMS_SQL)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token counts vs CMS point estimates over the documents
    vocabulary (operators/cmsketch.py, w=32/d=3 — data-chosen so both
    the clean-row and all-rows-collided estimate classes occur; see the
    module docstring). The whole-corpus exact groupBy exists HERE
    because the audit needs it; the sketch's production value is that
    later batches query the d*w-bounded relation instead of rebuilding
    this groupBy (the probe pinned the estimate side flat at 10x
    corpus). Output is vocabulary-sized (31 rows)."""
    toks = (
        _docs(spark, sf_dir, ["text"])
        .select(F.explode(TXT.tokens("text")).alias("tok"))
        .where(F.col("tok") != "")
    )
    sketch = cms_build(toks, "tok", w=_CMS_W, d=_CMS_D)
    exact = toks.groupBy("tok").agg(F.count("*").alias("exact_cnt"))
    est = cms_estimate(
        exact.select("tok"), sketch, "tok", w=_CMS_W, d=_CMS_D
    ).withColumnRenamed("key", "tok")
    return (
        exact.join(est, "tok")
        .select(
            F.col("tok").alias("token"),
            "exact_cnt",
            F.col("est").alias("est_cnt"),
            (F.col("est") - F.col("exact_cnt")).alias("overcount"),
        )
        .orderBy("token")
    )
