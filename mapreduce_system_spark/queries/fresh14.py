"""Round-16 registrations for the r17 window lead (the stage-in-N,
wire-in-N+1 pattern): two surfaces whose OPERATOR halves were staged in
r15 with pytest-pinned parity and drafted oracles (tests/test_ktruss.py's
pure-Python reference + unrolled CTE + 25-topology fuzz,
tests/test_collocation.py's reference + oracle draft + 15-corpus fuzz).
Registering them now, PAST the r16 window (which the 5 fresh12/fresh13
debuts + the r12-stale cohort + the oldest r13 rows consume exactly,
VERDICT r15 #1), hands them the r17 window's lead slots.

- ``graph_k_truss`` — synchronous k-truss peeling of the RAW part
  co-purchase graph with DATA-CHOSEN constants (VERDICT r15 #2: the
  staging probe showed the support-2 graph is nearly triangle-free —
  3 surviving edges at sf0.1, k=4 empty everywhere — so a row over it
  would verify almost nothing). The raw graph is triangle-RICH
  (support histogram peaks at ~10 at sf0.01, ~4 at sf0.1), and k=8 /
  rounds=2 exercises a real cascade at BOTH gate and bench scales:
  sf0.01 peels 6.3% round 1 + 4.6% round 2 (103,522 of 115,729 edges
  survive, final supports spanning 1..32); sf0.1 peels ~58% across the
  two rounds. Output is the bounded final-support CENSUS (support,
  n_edges, sum_u, sum_v) — ~32 rows that pin the surviving edge
  multiset in aggregate (any wrong edge moves its support bucket's
  count AND both endpoint sums) without shipping 100k edge rows
  through the gate's collect.
- ``txt_pmi_collocations`` — association-scored adjacent token pairs
  over documents: the measure ``txt_top_bigrams``' raw counts lack
  (a tight pair like "new york" outranks a frequent-but-predictable
  one like "the the"). Constants chosen with data: min_count=25 prunes
  ~22% of the sf0.01 candidate set before the vocab-sized unigram
  joins, and the top-20 boundary gap is ~2e-3 in unrounded PMI — no
  ulp-level rank risk between the engines' ln implementations.

Reference contrast: worker.go:104-165's one-shot map→reduce can count
triangles or bigrams once, but the truss re-enters its support census
every round (removing an edge changes OTHER edges' supports —
coordinator.go:126-141's one-shot pipeline cannot express the
cascade), and PMI joins a reducer's output (unigram counts) against a
second reducer's output (bigram counts) scaled by a third (corpus
totals) — a three-way reduce-of-reduces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_system_spark.operators.collocation import pmi_collocations
from mapreduce_system_spark.operators.graph import k_truss_edges
from mapreduce_system_spark.queries._graphshared import copurchase_pairs
from mapreduce_system_spark.queries._textshared import _TOKS, _docs
from mapreduce_system_spark.registry import register

# ---------------------------------------------------------------------------
# graph_k_truss — edge-level density filter (synchronous truss peeling)
# ---------------------------------------------------------------------------

_KTRUSS_K = 8
_KTRUSS_ROUNDS = 2


def _ktruss_support_ctes(prev: str, tag: str) -> str:
    """Triangle listing + member-edge support census of edge set
    ``prev`` — tests/test_ktruss.py's draft algebra: the simple a<b<c
    triangle form (support is orientation-independent, so the
    operator's degree-ordered enumeration counts the same set), one
    member-edge support aggregate. MATERIALIZED is load-bearing on the
    triangle CTE (and on every multi-referenced edge CTE below):
    DuckDB 1.0 INLINES CTEs at every reference site, so the nested
    3-round stack re-expands each round's triangle enumeration
    exponentially without it — the plain spelling did not finish at
    sf0.01 in 15 minutes; the materialized one runs in ~2 s (measured
    r16)."""
    return f"""t{tag} AS MATERIALIZED (
  SELECT e1.u AS a, e1.v AS b, e2.v AS c
  FROM {prev} e1
  JOIN {prev} e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN {prev} e3 ON e3.u = e1.v AND e3.v = e2.v
), s{tag} AS (
  SELECT u, v, CAST(count(*) AS BIGINT) AS cnt FROM (
    SELECT a AS u, b AS v FROM t{tag}
    UNION ALL SELECT a, c FROM t{tag}
    UNION ALL SELECT b, c FROM t{tag}
  ) GROUP BY u, v
)"""


def _ktruss_round_cte(prev: str, cur: str, r: int, k: int) -> str:
    """One unrolled synchronous truss round: the support census of
    ``prev`` then keep edges with support >= k-2."""
    return (
        _ktruss_support_ctes(prev, str(r))
        + f""", {cur} AS MATERIALIZED (
  SELECT e.u, e.v FROM {prev} e
  LEFT JOIN s{r} s ON s.u = e.u AND s.v = e.v
  WHERE coalesce(s.cnt, 0) >= {k - 2}
)"""
    )


_KTRUSS_SQL = (
    """
WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
e0 AS MATERIALIZED (
  SELECT DISTINCT a.p AS u, b.p AS v
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
),
"""
    + ",\n".join(
        _ktruss_round_cte(f"e{i}", f"e{i + 1}", i, _KTRUSS_K)
        for i in range(_KTRUSS_ROUNDS)
    )
    # one extra support pass over the FINAL edge set for the output
    # census (no further peel round — the census is the answer)
    + ",\n"
    + _ktruss_support_ctes(f"e{_KTRUSS_ROUNDS}", "f")
    + f"""
SELECT CAST(coalesce(s.cnt, 0) AS BIGINT) AS support,
       CAST(count(*) AS BIGINT) AS n_edges,
       CAST(sum(e.u) AS BIGINT) AS sum_u,
       CAST(sum(e.v) AS BIGINT) AS sum_v
FROM e{_KTRUSS_ROUNDS} e
LEFT JOIN sf s ON s.u = e.u AND s.v = e.v
GROUP BY 1 ORDER BY support
"""
)


@register("graph_k_truss", _KTRUSS_SQL)
def q_graph_k_truss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-round synchronous 8-truss of the RAW part co-purchase graph:
    each round removes EVERY edge whose current support (triangles it
    closes) is below 6, all at once; the output is the final-support
    census of the surviving edges — (support, n_edges, sum_u, sum_v)
    per support value. Where ``graph_k_core`` keeps well-connected
    NODES of the support-thresholded graph, the truss keeps EDGES
    embedded in triangle-dense neighborhoods of the raw graph — the
    stronger community-backbone filter (Cohen, 2008) a link-curation
    pipeline runs when co-occurrence alone is too easy to spam.

    Constants are DATA-CHOSEN (VERDICT r15 #2, measured in the r16
    exploration): on the raw graph k=8/rounds=2 peels 6.3% + 4.6%
    (cascade!) at sf0.01 with 103,522 survivors and final supports
    1..32, and ~58% cumulative at sf0.1 — non-vacuous at both scales,
    unlike the support-2 graph whose truss is 3 edges.

    Scale shape (operators/graph.py::k_truss_edges): per round ONE
    degree-ordered O(E·arboricity) triangle enumeration + ONE edge-keyed
    partial+final support aggregate; the per-round checkpoint is
    EDGE-sized because the recurrence state IS the surviving edge set
    (the honest floor, unlike k-core's node-sized state). Broadcast
    decisions stay AQE's — every join side is the cached/checkpointed
    edge relation or a degree table derived from it."""
    pr = copurchase_pairs(spark, sf_dir)
    out = k_truss_edges(
        pr, _KTRUSS_K, src="u", dst="v", rounds=_KTRUSS_ROUNDS,
        edges_undirected_distinct=True,
    )
    return (
        out.groupBy("support")
        .agg(
            F.count("*").alias("n_edges"),
            F.sum(F.col("u").cast("long")).alias("sum_u"),
            F.sum(F.col("v").cast("long")).alias("sum_v"),
        )
        .orderBy("support")
    )


# ---------------------------------------------------------------------------
# txt_pmi_collocations — association-scored adjacent token pairs
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 25
_PMI_TOP_K = 20

_PMI_SQL = f"""
WITH toks AS (
  SELECT {_TOKS} AS ts FROM documents
), base AS (SELECT ts FROM toks WHERE len(ts) >= 1),
uni AS (SELECT unnest(ts) AS w FROM base),
uc AS (SELECT w, CAST(count(*) AS BIGINT) AS n_w FROM uni GROUP BY w),
tot AS (
  SELECT CAST(sum(len(ts)) AS DOUBLE) AS nu,
         CAST(sum(greatest(len(ts) - 1, 0)) AS DOUBLE) AS nb
  FROM base
),
bi AS (
  SELECT unnest([ts[i] || ' ' || ts[i + 1] for i in range(1, len(ts))]) AS bigram
  FROM base WHERE len(ts) >= 2
),
bc AS (
  SELECT bigram, CAST(count(*) AS BIGINT) AS n_xy
  FROM bi GROUP BY bigram HAVING count(*) >= {_PMI_MIN_COUNT}
),
j AS (
  SELECT b.bigram, b.n_xy, ux.n_w AS nx, uy.n_w AS ny, t.nu, t.nb
  FROM bc b
  JOIN uc ux ON ux.w = string_split(b.bigram, ' ')[1]
  JOIN uc uy ON uy.w = string_split(b.bigram, ' ')[2]
  CROSS JOIN tot t
),
scored AS (
  SELECT bigram, n_xy,
         ln((CAST(n_xy AS DOUBLE) / nb)
            / ((CAST(nx AS DOUBLE) / nu) * (CAST(ny AS DOUBLE) / nu))) AS pmi_raw
  FROM j
)
SELECT bigram, n_xy, round(pmi_raw, 6) AS pmi
FROM scored ORDER BY pmi_raw DESC, bigram LIMIT {_PMI_TOP_K}
"""


@register("txt_pmi_collocations", _PMI_SQL)
def q_txt_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 adjacent token pairs by pointwise mutual information
    (count floor 25) — the association measure ``txt_top_bigrams``'
    raw document-frequency counts lack: PMI = ln(P(xy)/(P(x)P(y)))
    rewards pairs that co-occur MORE than their parts predict, so a
    tight collocation outranks a frequent-but-predictable pair. The
    phrase-mining primitive of every tokenizer-vocabulary and
    quality-filter pipeline.

    Ranking is on UNROUNDED PMI desc then bigram asc (the rrf_fuse
    display-rounding discipline); the count floor rides the bigram
    aggregate BEFORE the vocab-sized unigram joins (hapax suppression
    AND join-input pruning in one predicate — at sf0.01 it removes
    ~22% of candidates, measured). Scale shape: two token-keyed
    aggregates (map-side combinable) + two vocab-sized equi-joins +
    one broadcast of the 1-row totals; nothing corpus-sized shuffles
    twice (operators/collocation.py caches the tokenized projection —
    single tokenization, ADVICE r15 #4)."""
    docs = _docs(spark, sf_dir, ["text"])
    return pmi_collocations(
        docs, min_count=_PMI_MIN_COUNT, top_k=_PMI_TOP_K
    )
