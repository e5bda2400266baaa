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

Round-15 window (50 slots), executing VERDICT.md r14 #1 verbatim — the
3 zero-evidence r14 registrations + the full 20-query r11 cohort + the
oldest 27 of the 50-query r12 cohort, leaving no catalog query's
freshest driver row older than r12:

- fresh11 (3, slots 1-3) — ``stream_interval_join_outer``,
  ``txt_rrf_fusion``, ``emb_matryoshka_profile``, registered r14 past
  the window with oracles + staged-operator tests at birth: the only
  catalog entries with ZERO driver rows take the lead for their first
  (the graphml2/fresh10/fresh11 debut precedent);
- streaming (8, 4-11) + fresh (4, 12-15) + fresh8e (2, 16-17) +
  fresh8c (3, 18-20) + fresh8a (2, 21-22) + fresh7d (1, 23) — the
  ENTIRE r11-fresh cohort (would age to 4 rounds stale otherwise;
  VERDICT r14 #1);
- mrcore (9, 24-32) + pipeline (8, 33-40) + textstats2 (2, 41-42) +
  fresh7b (3, 43-45) + fresh8b (4, 46-49) + fresh8d's first (50) —
  the oldest 27 of the r12 cohort, oldest-first.

Sums to 50 exactly. Round-16 window DRAFT (slot arithmetic): the FIVE
r15 registrations made past this window take the lead — fresh12 3
(slots 1-3: ``graph_k_core`` over the r14-staged, gated-broadcast
``operators/graph.py::k_core_peel``, ``agg_histogram_sketch_rollup``
over ``operators/histsketch.py::histogram_sketch_rollup``,
``stream_two_stage_windowed`` over the multiple-validated
``streaming/windows.py::two_stage_windowed_max``) + fresh13 2 (slots
4-5: ``rel_funnel_time_bounded`` over ``operators/funnel.py``,
``dedup_bloom_prefilter`` over ``operators/bloomsketch.py`` — the
fresh10 same-round precedent: operator + tests + fuzz + oracle at
birth) — then fresh8d 4 (its head takes a second row; the module moves
as one) + the r12 remainder fresh8f 5 + fresh8g 4 + fresh8h 6 +
fresh8l 2 + fresh8j 3 (through slot 29) + the oldest r13-window
modules graphml2 2 + fresh8i 4 + fresh8k 2 + fresh8m 3 + temporal2 2 +
fresh6 3 + graphml 2 (slots 30-47) + relational2's first 3 (48-50).
Sums to 50 exactly; the r13 remainder (relational2 tail +
textstats/fresh7b2/fresh7*/multimodal/fresh9) and this round's
r14-window modules open r17. Keep the arithmetic ledgered here when
the r16 rotation lands.

r16 debut candidates, STAGED r15 with tests + drafted oracles (the
staging pattern — register past the r16 window for r17 driver rows,
or same-round per the fresh10 precedent): synchronous k-truss peeling
(``operators/graph.py::k_truss_edges`` — the EDGE-level density
filter next to k-core's node-level one, degree-ordered triangle
enumeration per round; planned ``graph_k_truss`` over the support-2
co-purchase graph; tests/test_ktruss.py carries the pure-Python
reference, the unrolled per-round CTE draft, and a 25-topology fuzz)
and PMI collocations
(``operators/collocation.py::pmi_collocations`` — association-scored
adjacent pairs, the measure ``txt_top_bigrams``' raw counts lack;
planned ``txt_pmi_collocations``; tests/test_collocation.py carries
the reference, the oracle draft, and a 15-corpus fuzz).
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    fresh11,       # first-ever driver rows (window 1-3)
    streaming,     # r11 rows (window 4-11)
    fresh,         # r11 rows (window 12-15)
    fresh8e,       # r11 rows (window 16-17)
    fresh8c,       # r11 rows (window 18-20)
    fresh8a,       # r11 rows (window 21-22)
    fresh7d,       # r11 row (window 23)
    mrcore,        # §2a mr-core, r12 rows (window 24-32)
    pipeline,      # r12 rows (window 33-40)
    textstats2,    # r12 rows (window 41-42)
    fresh7b,       # r12 rows (window 43-45)
    fresh8b,       # r12 rows (window 46-49)
    fresh8d,       # r12 rows (window 50 = its first; tail r16)
    # --- out of window from here (all driver-green r12/r13/r14,
    # re-verified at HEAD by tools/verify_local.py at close) ---
    fresh12,       # NEW r15 registrations — r16 window lead (debut pattern)
    fresh13,       # NEW r15 registrations, 2nd batch — r16 window lead
    fresh8f,       # r12 rows — r16 window
    fresh8g,       # r12 rows — r16 window
    fresh8h,       # r12 rows — r16 window
    fresh8l,       # r12 rows — r16 window
    fresh8j,       # r12 rows — r16 window
    graphml2,      # r13 rows — r16 window
    fresh8i,       # r13 rows — r16 window
    fresh8k,       # r13 rows — r16 window
    fresh8m,       # r13 rows — r16 window
    temporal2,     # r13 rows — r16 window
    fresh6,        # r13 rows — r16 window
    graphml,       # r13 rows — r16 window
    relational2,   # r13 rows — r16 window head / r17
    textstats,     # r13 rows — r17
    fresh7b2,      # r13 rows — r17
    fresh7,        # r13 row — r17
    fresh7c,       # r13 rows — r17
    fresh7e,       # r13 row — r17
    fresh7f,       # r13 rows — r17
    multimodal,    # r13 rows — r17
    fresh9,        # r13 rows — r17
    fresh10,       # r14 rows (r14 window) — r17
    temporal,      # r14 rows — r17
    advanced,      # r14 rows — r17
    similarity,    # r14 rows — r17
    multimodal2,   # r14 row — r17
    sinks,         # r14 rows — r17
    dedup,         # r14 rows — r17
    relational,    # r14 rows — r17
)
