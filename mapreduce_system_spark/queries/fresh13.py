"""Round-15 registrations, second batch (the fresh10 precedent:
operator halves landed THIS round with pytest-pinned parity, drafted
oracles, and fuzz sweeps — tests/test_funnel.py, tests/test_bloomsketch
.py — and register in the same round PAST the window, taking r16 window
slots for their first driver rows alongside fresh12).

- ``rel_funnel_time_bounded`` — the conversion-window funnel: users
  progressing view → click → purchase in order WITH every later step
  inside 30 minutes of the user's funnel entry. The parameterized
  ``operators/funnel.py::funnel_conversion`` generalizes the inline
  algebra of the driver-green ``rel_funnel_conversion`` (fresh7e,
  untouched); ``max_span`` is the capability the inline query cannot
  express — the attribution-window question every product dashboard
  pairs with the unbounded funnel.
- ``dedup_bloom_prefilter`` — the ingestion membership prefilter over
  a mergeable Bloom sketch (``operators/bloomsketch.py``): which of
  today's batch fingerprints are DEFINITELY new vs maybe-seen against
  the corpus-history sketch, audited against the exact answer as a
  (maybe_seen, actually_seen) confusion census. The bounded-summary
  complement of ``pipe_incremental_dedup``'s exact anti-join: at
  100 TB the history side of that join is corpus-sized every batch,
  while the sketch is m-bounded and merged, and the no-false-negative
  guarantee means rows the filter clears never need the exact path.
  Like ``pipe_strip_boilerplate`` staged its banner/footer, the batch
  STAGES a deterministic re-crawl slice (every 7th history doc rides
  today's batch) so the seen class is populated — the fixture's
  documents are exact-dup-free across the hash split by construction.

Reference contrast: worker.go:104-165 can count per-type events or
build the position set (each one map→reduce pass), but the funnel's
step k filters on step k-1's OUTPUT and the prefilter joins a SECOND
dataset against reduced state — re-entrant shapes the one-shot
pipeline cannot express (same class as k-core's cascade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.functions.hashing import md5_bucket32, md5_bucket32_sql
from mapreduce_system_spark.functions.text import fingerprint
from mapreduce_system_spark.caches import tracked_cache
from mapreduce_system_spark.operators.bloomsketch import (
    bloom_build,
    bloom_maybe_contains,
    bloom_params,
)
from mapreduce_system_spark.operators.funnel import funnel_conversion
from mapreduce_system_spark.registry import register
from mapreduce_system_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# rel_funnel_time_bounded — conversion inside a 30-minute window
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_SPAN_MIN = 30


def _funnel_step_cte(prev: str, cur: str, step: str) -> str:
    """One chained bounded funnel step — tests/test_funnel.py's draft,
    verbatim (strictly-after + first-entry-anchored span)."""
    return f"""{cur} AS (
  SELECT e.user_id, min(e.ts) AS t, p.t0 AS t0
  FROM ev e JOIN {prev} p ON e.user_id = p.user_id
  WHERE e.event_type = '{step}' AND e.ts > p.t
    AND e.ts <= p.t0 + INTERVAL '{_FUNNEL_SPAN_MIN} minutes'
  GROUP BY e.user_id, p.t0
)"""


_FUNNEL_TB_SQL = (
    f"""
WITH ev AS (
  SELECT user_id, ts, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
), s1 AS (
  SELECT user_id, min(ts) AS t, min(ts) AS t0
  FROM ev WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
), """
    + ", ".join(
        _funnel_step_cte(f"s{i}", f"s{i + 1}", s)
        for i, s in enumerate(_FUNNEL_STEPS[1:], start=1)
    )
    + ", counts AS ("
    + " UNION ALL ".join(
        f"SELECT {i + 1} AS step_idx, '{s}' AS step, "
        f"(SELECT CAST(count(*) AS BIGINT) FROM s{i + 1}) AS n_users"
        for i, s in enumerate(_FUNNEL_STEPS)
    )
    + """)
SELECT step_idx, step, n_users,
       coalesce(round(CAST(n_users AS DOUBLE)
             / nullif((SELECT n_users FROM counts WHERE step_idx = 1), 0),
             6), 0.0) AS frac_of_first
FROM counts ORDER BY step_idx
"""
)


@register("rel_funnel_time_bounded", _FUNNEL_TB_SQL)
def q_funnel_time_bounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase conversion where every later step lands
    within 30 minutes of the user's FIRST view (the industry
    first-arrival anchor, documented on the operator): per step the
    surviving user count and the fraction of funnel entrants. Scale
    shape is fresh7e's (one filtered min-aggregate + one user-sized
    equi-join per step, stages only shrink), with the span condition
    riding the existing join — no extra shuffle. Empty-input parity
    (ADVICE r15): a fully-filtered events relation still emits 3 rows
    on BOTH engines (one-row aggregates / scalar subqueries count 0),
    so the oracle wraps the division in coalesce(..., 0.0) to match
    the operator's pinned frac_of_first=0.0 on a zero-entrant funnel."""
    ev = load_table(spark, sf_dir, "events", columns=["user_id", "ts", "event_type"])
    return funnel_conversion(
        ev,
        _FUNNEL_STEPS,
        max_span=f"{_FUNNEL_SPAN_MIN} minutes",
    )


# ---------------------------------------------------------------------------
# dedup_bloom_prefilter — membership prefilter + exact audit census
# ---------------------------------------------------------------------------

# Sized-by-n (VERDICT r16 #5): m derives from the MEASURED distinct
# history count via bloom_params' m = ceil(-n ln p / ln^2 2) — the
# --bloom probe showed the old fixed m=65536 saturating at 10x history
# (fp 0.76: the sketch filtered nothing). k is a pure function of the
# fp target (round(-log2 p) = 7 at 1%), so it stays an authoring-time
# constant and the oracle's probes CTE stays static; m is computed at
# run time on BOTH engines from the same history relation.
_BLOOM_FP_TARGET = 0.01
_BLOOM_K = bloom_params(1, _BLOOM_FP_TARGET)[1]
_BATCH_BUCKET = 90  # md5(doc_id) buckets >= this play "today's crawl"
_RECRAWL_MOD = 7    # every 7th history doc rides today's batch too

_BLOOM_PROBES_SQL = " UNION ALL ".join(
    f"SELECT {i} AS i" for i in range(_BLOOM_K)
)

# m's formula spelled with the same IEEE-double operation order as
# bloom_params: (-n * ln(p)) / (ln(2) * ln(2)), then ceil.
_BLOOM_M_SQL = (
    f"greatest(1, CAST(ceil(-n * ln({_BLOOM_FP_TARGET}) / (ln(2) * ln(2)))"
    " AS UBIGINT))"
)

_BLOOM_SQL = rf"""
WITH probes AS ({_BLOOM_PROBES_SQL}),
b AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '\W+', ' ', 'g'))) AS fp,
         {md5_bucket32_sql("CAST(doc_id AS VARCHAR)")} % 100 AS bk
  FROM documents WHERE doc_id IS NOT NULL AND text IS NOT NULL
),
hist AS (SELECT DISTINCT fp FROM b WHERE bk < {_BATCH_BUCKET}),
par AS (
  SELECT {_BLOOM_M_SQL} AS m
  FROM (SELECT CAST(count(*) AS BIGINT) AS n FROM hist)
),
batch AS (
  SELECT DISTINCT fp FROM (
    SELECT fp FROM b WHERE bk >= {_BATCH_BUCKET}
    UNION ALL
    SELECT fp FROM b WHERE bk < {_BATCH_BUCKET} AND doc_id % {_RECRAWL_MOD} = 0
  )
),
sketch AS (
  SELECT DISTINCT
    ('0x' || substr(md5(h.fp || ':' || i), 1, 8))::UBIGINT % (SELECT m FROM par) AS pos
  FROM hist h CROSS JOIN probes
),
bpos AS (
  SELECT ba.fp,
    ('0x' || substr(md5(ba.fp || ':' || i), 1, 8))::UBIGINT % (SELECT m FROM par) AS pos
  FROM batch ba CROSS JOIN probes
),
verd AS (
  SELECT fp,
         count(*) = count(*) FILTER (WHERE pos IN (SELECT pos FROM sketch))
           AS maybe_seen
  FROM bpos GROUP BY fp
)
SELECT v.maybe_seen, h.fp IS NOT NULL AS actually_seen,
       CAST(count(*) AS BIGINT) AS n_fps
FROM verd v LEFT JOIN hist h ON h.fp = v.fp
GROUP BY 1, 2 ORDER BY 1, 2
"""


@register("dedup_bloom_prefilter", _BLOOM_SQL)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(maybe_seen, actually_seen, n_fps) confusion census of the Bloom
    prefilter verdicts for today's batch against the corpus-history
    sketch. The (false, true) class is IMPOSSIBLE (no false negatives
    — the operator's one-sided-error contract), so it can never appear
    on either engine; (true, false) rows are the measured false
    positives the audit exists to count. Fingerprints are the
    content-dedup family's shared ``fingerprint()`` normalization; the
    batch is the ``pipe_incremental_dedup`` hash split plus a staged
    deterministic re-crawl slice so the seen class is exercised. m is
    SIZED BY n (VERDICT r16 #5): one probe-sized driver scalar — the
    distinct history count, the documented-contract exception to
    no-collects — feeds ``bloom_params``, so the sketch cannot
    silently saturate as history grows the way the old fixed m=65536
    measurably did at 10x history (--bloom probe: fp 0.76). The base
    relation is tracked-cached: the count and the sketch build are two
    executions over the same fingerprints."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    base = tracked_cache(
        docs.where(F.col("doc_id").isNotNull())
        .select("doc_id", fingerprint("text").alias("fp"))
        .where(F.col("fp").isNotNull())
        .withColumn(
            "bk",
            F.pmod(md5_bucket32(F.col("doc_id").cast("string")), F.lit(100)),
        )
    )
    hist = base.where(F.col("bk") < _BATCH_BUCKET).select("fp")
    batch = (
        base.where(F.col("bk") >= _BATCH_BUCKET)
        .select("fp")
        .unionByName(
            base.where(
                (F.col("bk") < _BATCH_BUCKET)
                & (F.col("doc_id") % _RECRAWL_MOD == 0)
            ).select("fp")
        )
    )
    n_hist = hist.distinct().count()
    m, k = bloom_params(n_hist, _BLOOM_FP_TARGET)
    assert k == _BLOOM_K  # k is a pure function of the target (static probes CTE)
    sketch = bloom_build(hist, "fp", m=m, k=_BLOOM_K)
    verd = bloom_maybe_contains(batch, sketch, "fp", m=m, k=_BLOOM_K)
    seen = (
        hist.distinct()
        .select(F.col("fp").alias("key"))
        .withColumn("hit", F.lit(True))
    )
    return (
        verd.join(seen, "key", "left")
        .select(
            "maybe_seen",
            F.coalesce(F.col("hit"), F.lit(False)).alias("actually_seen"),
        )
        .groupBy("maybe_seen", "actually_seen")
        .agg(F.count("*").alias("n_fps"))
        .orderBy("maybe_seen", "actually_seen")
    )
