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

Round-13 window (50 slots), executing VERDICT.md r12 #1/#2 — the r12
draft exactly as written, plus the five debuts in its five free slots:

- graphml2 (2, slots 1-2) — ``graph_pagerank_personalized`` +
  ``basket_association_rules``, registered r12 past the window: the
  only catalog entries with ZERO driver rows take the lead for their
  first (the stage-in-N, wire-in-N+1, driver-green-in-N+1 pattern);
- fresh8i (4, 3-6) + fresh8k (2, 7-8) + fresh8m (3, 9-11) +
  temporal2 (2, 12-13) — the entire r09-stale cohort (the 10 queries
  VERDICT r12 names, three rounds old, plus ``fn_math_scalar_profile``
  riding temporal2);
- fresh6 (3, 14-16) — CHANGED in r12 (the ``_run_session_stream``
  stats hook) and again r13 (the recentProgress retention pin, ADVICE
  r12): changed code re-enters the window;
- the r11 tail now two rounds old: graphml (2, 17-18) + relational2
  (6, 19-24) + textstats (7, 25-31) + fresh7b2 (2, 32-33) + fresh7
  (1, 34) + fresh7c (2, 35-36) + fresh7e (1, 37) + fresh7f (3, 38-40)
  + multimodal (5, 41-45 — the GIF branch joined the default decode
  chain in r12, and the LZW table cap landed r13);
- fresh9 (5, 46-50) — the r13 DEBUTS, each an r12-staged operator half
  with pytest + probes getting its registered query and driver row at
  birth: ``rel_join_cardinality_exact`` + ``rel_join_cardinality_sampled``
  (operators/cardinality.py; ``scale_probe_r12_card.json``),
  ``mm_image_gif_stats`` (``decode_image_gif_planes`` over the r12 GIF
  codec, export pattern), ``agg_distinct_sketch_rollup``
  (operators/hll.py, band-boolean oracle per the measured HIP
  contract), ``stream_state_audit`` (``read_group_state`` — the
  checkpoint itself as the query result, batch aggregate oracle).

Round-14 window DRAFT (slot arithmetic): fresh10 3 (slots 1-3 —
``graph_label_propagation``, ``pipe_strip_boilerplate``,
``dedup_tfidf_cosine_pairs``, registered r13 past the window with
oracles + staged-operator tests at birth: the only catalog entries
with zero driver rows take the lead, the graphml2 precedent) +
streaming 8 (4-11 — its r11 rows hit the two-round line at r13 close;
VERDICT r12 #7 names it early) + the rest of the r11 tail: fresh 4
(12-15) + fresh8e 2 (16-17) + fresh8c 3 (18-20) + fresh8a 2 (21-22) +
fresh7d 1 (23) + the oldest r10 cohort: temporal 5 (24-28) + advanced
7 (29-35) + similarity 9 (36-44) + multimodal2 1 (45) + sinks 5
(46-50). Sums to 50 exactly; dedup 8 + relational 12 (r10 rows) open
the r15 window. Keep the arithmetic ledgered here when the r14
rotation lands.

The r14 streaming refresh also has a staged half ready:
``streaming/windows.py::interval_join(how='left_outer')`` (r13, parity
pinned with a sentinel-advanced watermark in tests/test_streaming.py)
— register ``stream_interval_join_outer`` alongside the streaming
window rotation, batch LEFT JOIN oracle.

r15 debut candidates, STAGED r13 with tests + drafted oracles
(tests/test_fusion.py — the staging pattern): reciprocal-rank fusion
(``operators/fusion.py::rrf_fuse``; planned ``txt_rrf_fusion`` fusing
the registered BM25 ranking with a term-coverage ranking over the same
query set) and the Matryoshka truncation diagnostic
(``operators/similarity.py::matryoshka_norm_profile``; planned
``emb_matryoshka_profile`` over the embeddings table, labels x
{8,16,32,64} prefixes). Wire them past the r14 window for first driver
rows in r15 — the stage-in-N, wire-in-N+1 cadence, one round ahead.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    graphml2,      # first-ever driver rows (window 1-2)
    fresh8i,       # r09 rows (window 3-6)
    fresh8k,       # r09 rows (window 7-8)
    fresh8m,       # r09 rows (window 9-11)
    temporal2,     # fn_json_map_props r09 (window 12-13)
    fresh6,        # changed r12+r13 (window 14-16)
    graphml,       # r11 rows (window 17-18)
    relational2,   # r11 rows (window 19-24)
    textstats,     # r11 rows (window 25-31)
    fresh7b2,      # r11 rows (window 32-33)
    fresh7,        # r11 row (window 34)
    fresh7c,       # r11 rows (window 35-36)
    fresh7e,       # r11 row (window 37)
    fresh7f,       # r11 rows (window 38-40)
    multimodal,    # r11 rows, GIF chain r12 (window 41-45)
    fresh9,        # NEW r13 debuts (window 46-50)
    # --- out of window from here (all driver-green r10/r11/r12,
    # re-verified at HEAD in bench_runs/verify_full_r13.json at close) ---
    fresh10,       # NEW r13 registrations — r14 window lead (debut pattern)
    streaming,     # r11 rows — r14 window (two-round line at r13 close)
    fresh,         # r11 rows — r14 window
    fresh8e,       # r11 rows — r14 window
    fresh8c,       # r11 rows — r14 window
    fresh8a,       # r11 rows — r14 window
    fresh7d,       # r11 row — r14 window
    temporal,      # r10 rows — r14 window
    advanced,      # r10 rows — r14 window
    similarity,    # r10 rows — r14 window
    multimodal2,   # r10 row — r14 window
    sinks,         # r10 rows — r14 window
    dedup,         # r10 rows — r15 lead
    relational,    # r10 rows — r15
    mrcore,        # §2a mr-core, r12 rows (refreshed last round)
    pipeline,      # r12 rows
    textstats2,    # r12 rows
    fresh7b,       # r12 rows
    fresh8b,       # r12 rows, UDF/UDTF cohort
    fresh8d,       # r12 rows
    fresh8f,       # r12 rows
    fresh8g,       # r12 rows
    fresh8h,       # r12 rows
    fresh8l,       # r12 rows
    fresh8j,       # r12 rows
)
