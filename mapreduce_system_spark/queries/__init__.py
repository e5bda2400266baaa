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

Round-16 window (50 slots), executing VERDICT.md r15 #1 verbatim — the
FIVE zero-evidence r15 registrations in the lead slots + the entire
23-query r12-stale cohort + the oldest r13 rows to fill 50, leaving no
catalog query's freshest driver row older than r13:

- fresh12 (3, slots 1-3) — ``graph_k_core``,
  ``agg_histogram_sketch_rollup``, ``stream_two_stage_windowed``,
  registered r15 past the window with oracles + staged-operator tests
  at birth: zero driver rows until now, so they take the lead;
- fresh13 (2, slots 4-5) — ``rel_funnel_time_bounded``,
  ``dedup_bloom_prefilter``, same debut pattern (and the Bloom query's
  10× ``--bloom`` probe ran BEFORE this row per VERDICT r15 #4);
- fresh8d (4, 6-9) + fresh8f (5, 10-14) + fresh8g (4, 15-18) +
  fresh8h (6, 19-24) + fresh8l (2, 25-26) + fresh8j (3, 27-29) — the
  ENTIRE r12-stale cohort (fresh8d's head re-rowed r15 as slot 50; the
  module moves as one);
- graphml2 (2, 30-31) + fresh8i (4, 32-35) + fresh8k (2, 36-37) +
  fresh8m (3, 38-40) + temporal2 (2, 41-42) + fresh6 (3, 43-45) +
  graphml (2, 46-47) + relational2's first 3 (48-50) — the oldest r13
  rows, oldest-first.

Sums to 50 exactly. Round-17 window DRAFT (slot arithmetic): the FIVE
r16 registrations lead (fresh14 2: ``graph_k_truss`` over the
r15-staged ``operators/graph.py::k_truss_edges`` with DATA-CHOSEN
constants per VERDICT r15 #2, ``txt_pmi_collocations`` over
``operators/collocation.py::pmi_collocations``; fresh15 2:
``graph_components_jump`` over the r16-staged-and-probed
``connected_components_jump``, ``stream_interval_join_full`` over the
full-outer ``interval_join``; fresh16 1: ``agg_cms_heavy_hitters``
over the r16-staged Count-Min sketch — all three fresh15/fresh16
debuts probe-green BEFORE registration; the round's OTHER staged
operator, the E-S sampler, was found already registered as fresh7f's
``pipe_weighted_sample`` and deliberately NOT re-registered — see
fresh16's docstring and the registry duplicate guard it motivated)
+ relational2's tail 3 + the r13 remainder textstats 7 + fresh7b2 2 +
fresh7 1 + fresh7c 2 + fresh7e 1 + fresh7f 3 + multimodal 5 + fresh9 5
(through slot 34) + the oldest r14-row modules fresh10 3 + temporal 5
+ advanced 7 (through 49) + similarity's first 1 (50). Sums to 50
exactly; the similarity tail + multimodal2/sinks/dedup/relational and
this round's r15-window modules (fresh11, streaming, fresh, fresh8e,
fresh8c, fresh8a, fresh7d, mrcore, pipeline, textstats2, fresh7b,
fresh8b — all r15 rows) open r18. Keep the arithmetic ledgered here
when the r17 rotation lands.

r17 debut candidates, STAGED r16 with tests + drafted oracles (the
staging pattern): see the module docstrings of the two staged
operators committed this round alongside their probe records —
pointer-jumping connected components (operators/graph.py::
connected_components_jump, probe --ccjump) and the FULL OUTER
stream-stream interval join (streaming/windows.py, probe --fjoin).
ALSO staged r16: the Count-Min frequency sketch (operators/
cmsketch.py — probe-first, then REGISTERED same-round as
``agg_cms_heavy_hitters``, fresh16) and deterministic weighted
sampling (operators/sampling.py — probed and tested, then found to
duplicate fresh7f's ``pipe_weighted_sample`` surface and deliberately
left operator-only; the near-collision added registry.register's
duplicate-name guard).

r17 debut candidates, STAGED r16 late-round with tests + drafted
oracles + probe modes (the staging pattern): sorted-neighborhood
blocking — the ORDER-based candidate generator the content-blocking
dedup family lacks, with the distributed global-position offset
stitch (operators/blocking.py, tests/test_blocking.py, probe
--sneighbor; ``dedup_sorted_neighborhood`` planned) — and interpolated
Kneser-Ney bigram scoring, the smoothed LM the add-one surprisal
queries approximate (operators/lm.py, tests/test_lm.py, probe --knlm;
``txt_kneser_ney_surprisal`` planned).
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    fresh12,       # first-ever driver rows (window 1-3)
    fresh13,       # first-ever driver rows (window 4-5)
    fresh8d,       # r12 rows (head re-rowed r15) (window 6-9)
    fresh8f,       # r12 rows (window 10-14)
    fresh8g,       # r12 rows (window 15-18)
    fresh8h,       # r12 rows (window 19-24)
    fresh8l,       # r12 rows (window 25-26)
    fresh8j,       # r12 rows (window 27-29)
    graphml2,      # r13 rows (window 30-31)
    fresh8i,       # r13 rows (window 32-35)
    fresh8k,       # r13 rows (window 36-37)
    fresh8m,       # r13 rows (window 38-40)
    temporal2,     # r13 rows (window 41-42)
    fresh6,        # r13 rows (window 43-45)
    graphml,       # r13 rows (window 46-47)
    relational2,   # r13 rows (window 48-50 = its first 3; tail r17)
    # --- out of window from here (all driver-green r13/r14/r15,
    # re-verified at HEAD by tools/verify_local.py at close) ---
    fresh14,       # NEW r16 registrations — r17 window lead (debut pattern)
    fresh15,       # NEW r16 registrations (probe-first) — r17 window lead
    fresh16,       # NEW r16 registrations (probe-first) — r17 window lead
    textstats,     # r13 rows — r17
    fresh7b2,      # r13 rows — r17
    fresh7,        # r13 row — r17
    fresh7c,       # r13 rows — r17
    fresh7e,       # r13 row — r17
    fresh7f,       # r13 rows — r17
    multimodal,    # r13 rows — r17
    fresh9,        # r13 rows — r17
    fresh10,       # r14 rows — r17
    temporal,      # r14 rows — r17
    advanced,      # r14 rows — r17
    similarity,    # r14 rows — r17 head / r18
    multimodal2,   # r14 row — r18
    sinks,         # r14 rows — r18
    dedup,         # r14 rows — r18
    relational,    # r14 rows — r18
    fresh11,       # r15 rows — r18
    streaming,     # r15 rows — r18
    fresh,         # r15 rows — r18
    fresh8e,       # r15 rows — r18
    fresh8c,       # r15 rows — r18
    fresh8a,       # r15 rows — r18
    fresh7d,       # r15 row — r18
    mrcore,        # r15 rows — r18
    pipeline,      # r15 rows — r18
    textstats2,    # r15 rows — r18
    fresh7b,       # r15 rows — r18
    fresh8b,       # r15 rows — r18
)
