"""Registered query catalog, grouped by domain.

Importing this package registers every domain query (relational, text/LLM
pipeline, temporal, streaming-parity, multimodal) into
``mapreduce_system_spark.registry.QUERIES`` / ``ORACLE_SQL``. Since the
r10 self-review, registration order is a pure function of THIS import
list from every entry point — see registry.py's bottom-import comment
for the mechanism.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness sweep covers the
first 50 registered queries in registration order. Modules whose queries
are NEW this round, changed this round, or carry the catalog's oldest
driver evidence are imported first; everything pushed past the window
has a fresh driver-green row from a recent CORRECTNESS_r*.json.

Round-17 window (50 slots), executing VERDICT.md r16 #1 — the FIVE
zero-evidence r16 registrations in the lead slots + the ENTIRE 29-query
r13-stale cohort + the oldest r14 rows to fill 50, leaving no catalog
query's freshest driver row older than r14:

- fresh14 (2, slots 1-2) — ``graph_k_truss``, ``txt_pmi_collocations``,
  registered r16 past the window with oracles + staged-operator tests
  + 1×/10× scale probes at birth: zero driver rows until now;
- fresh15 (2, slots 3-4) — ``graph_components_jump``,
  ``stream_interval_join_full``, same probe-first debut pattern;
- fresh16 (1, slot 5) — ``agg_cms_heavy_hitters``, same pattern;
- textstats (7, 6-12) + fresh7b2 (2, 13-14) + fresh7 (1, 15) +
  fresh7c (2, 16-17) + fresh7e (1, 18) + fresh7f (3, 19-21) +
  multimodal (5, 22-26) + fresh9 (5, 27-31) — 26 of the 29-query
  r13-stale cohort;
- fresh10 (3, 32-34) + temporal (5, 35-39) + advanced (7, 40-46) —
  the oldest r14 rows;
- relational2 (47-50) — the cohort's remaining 3 r13-stale queries
  (``rel_full_outer_join``, ``rel_pivot_priority_revenue``,
  ``rel_unpivot_metrics``), which the module now registers FIRST (its
  internal order was swapped this round precisely so the window
  boundary cuts the module where the evidence is stale — see
  relational2.py's docstring); slot 50 is ``agg_distinct_stats``
  (r16-fresh, harmless re-row), and the module's other two r16-fresh
  queries sit at 51-52 just past the line.

Sums to 50 exactly (2+2+1+7+2+1+2+1+3+5+5+3+5+7+4). Round-18 window
DRAFT (slot arithmetic): fresh17's two r17 registrations lead
(``dedup_sorted_neighborhood`` over the r16-staged
operators/blocking.py, ``txt_kneser_ney_surprisal`` over the r16-staged
operators/lm.py — both probe-first per the staging pattern), then
relational2's tail 2 + the r14-row modules similarity 9 + multimodal2 1
+ sinks 5 + dedup 8 + relational 12 (through slot 39) + the oldest
r15-row modules fresh11 3 + streaming 8 (through 50). Sums to 50
exactly; the remaining r15 modules (fresh, fresh8e, fresh8c, fresh8a,
fresh7d, mrcore, pipeline, textstats2, fresh7b, fresh8b) and this
round's r16-window modules (fresh12, fresh13, the fresh8* cohort,
graphml2, fresh8i/k/m, temporal2, fresh6, graphml — all r16 rows) open
r19. Keep the arithmetic ledgered here when the r18 rotation lands.

r18 debut candidates, STAGED r16 with tests + drafted oracles + probe
modes and REGISTERED r17 (fresh17): sorted-neighborhood blocking — the
ORDER-based candidate generator the content-blocking dedup family
lacks, with the distributed global-position offset stitch
(operators/blocking.py, tests/test_blocking.py, probe --sneighbor) —
and interpolated Kneser-Ney bigram scoring, the smoothed LM the add-one
surprisal queries approximate (operators/lm.py, tests/test_lm.py,
probe --knlm). Both follow the fresh12/fresh13/fresh14 wire-in-N+1
precedent: oracle + local gate row + birth pytest at registration,
first driver row with the next window lead.

r18 debut candidates, STAGED r17 with tests + drafted oracles + probe
modes (VERDICT r16 #6, keeping the stage-in-N cadence fed): the
densest-subgraph greedy peel (operators/densest.py — Bahmani et al.'s
synchronous 2(1+eps)-approx, node-sized recurrence state like k-core;
tests/test_densest.py with the planted-clique guarantee law; probe
--densest: per-round census exactly x10, density shard-local, wall
x1.76; NOTE for registration: at eps=0.5 the RAW co-purchase graph
peels to empty by round 3 with the best prefix at round 0 — pick the
support-thresholded graph or a smaller eps with data, the k-truss
lesson) and the SESSION-WINDOW stream-stream join
(streaming/windows.py::session_join — the session twin completing the
interval-join matrix, Flink semantics over the merged per-key
timeline; tests/test_sessionjoin.py with the bridging law the interval
join cannot express; probe --sessjoin: pairs and sessions exactly x10,
wall x0.93).
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    fresh14,       # first-ever driver rows (window 1-2)
    fresh15,       # first-ever driver rows (window 3-4)
    fresh16,       # first-ever driver row (window 5)
    textstats,     # r13 rows (window 6-12)
    fresh7b2,      # r13 rows (window 13-14)
    fresh7,        # r13 row (window 15)
    fresh7c,       # r13 rows (window 16-17)
    fresh7e,       # r13 row (window 18)
    fresh7f,       # r13 rows (window 19-21)
    multimodal,    # r13 rows (window 22-26)
    fresh9,        # r13 rows (window 27-31)
    fresh10,       # r14 rows (window 32-34)
    temporal,      # r14 rows (window 35-39)
    advanced,      # r14 rows (window 40-46)
    relational2,   # r13-stale trio first (window 47-49) + head of the
                   # r16-fresh trio (50); its tail 2 open r18
    # --- out of window from here (all driver-green r14/r15/r16,
    # re-verified at HEAD by tools/verify_local.py at close) ---
    fresh17,       # NEW r17 registrations — r18 window lead (debut pattern)
    similarity,    # r14 rows — r18
    multimodal2,   # r14 row — r18
    sinks,         # r14 rows — r18
    dedup,         # r14 rows — r18
    relational,    # r14 rows — r18
    fresh11,       # r15 rows — r18
    streaming,     # r15 rows — r18 tail
    fresh,         # r15 rows — r19
    fresh8e,       # r15 rows — r19
    fresh8c,       # r15 rows — r19
    fresh8a,       # r15 rows — r19
    fresh7d,       # r15 row — r19
    mrcore,        # r15 rows — r19
    pipeline,      # r15 rows — r19
    textstats2,    # r15 rows — r19
    fresh7b,       # r15 rows — r19
    fresh8b,       # r15 rows — r19
    fresh12,       # r16 rows — r19
    fresh13,       # r16 rows — r19
    fresh8d,       # r16 rows — r19
    fresh8f,       # r16 rows — r19
    fresh8g,       # r16 rows — r19
    fresh8h,       # r16 rows — r19
    fresh8l,       # r16 rows — r19
    fresh8j,       # r16 rows — r19
    graphml2,      # r16 rows — r19
    fresh8i,       # r16 rows — r19
    fresh8k,       # r16 rows — r19
    fresh8m,       # r16 rows — r19
    temporal2,     # r16 rows — r19
    fresh6,        # r16 rows — r19
    graphml,       # r16 rows — r19
)
