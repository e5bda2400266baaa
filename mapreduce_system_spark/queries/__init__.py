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

Round-14 window (50 slots), executing VERDICT.md r13 #1 verbatim — the
3 zero-evidence registrations + the entire 47-query r10-stale cohort,
leaving no catalog query's freshest driver row older than r11:

- fresh10 (3, slots 1-3) — ``graph_label_propagation``,
  ``pipe_strip_boilerplate``, ``dedup_tfidf_cosine_pairs``, registered
  r13 past the window with oracles + staged-operator tests at birth:
  the only catalog entries with ZERO driver rows take the lead for
  their first (the graphml2/fresh10 debut precedent). Note
  ``pipe_strip_boilerplate``'s oracle gained the NULL-doc_id filter
  this round (ADVICE r13 #1) — changed code rides in-window anyway;
- temporal (5, 4-8) + advanced (7, 9-15) + similarity (9, 16-24) +
  multimodal2 (1, 25) + sinks (5, 26-30) + dedup (8, 31-38) +
  relational (12, 39-50) — the ENTIRE r10-stale cohort (freshest
  driver rows three rounds old at r14: dedup family, kmeans,
  asof_join_events_orders, fn_date_*, mm_image_rgb_stats,
  rel_anti_join, the sink family, …). Oldest-first wins: this defers
  the previously-ledgered streaming-led window by one round — the 8
  stream rows are r11-fresh, one round younger (VERDICT r13 #1).

Sums to 50 exactly. Round-15 window DRAFT (slot arithmetic): fresh11 3
(slots 1-3 — the r14 debuts registered past this window:
``stream_interval_join_outer`` over the r13-staged
``streaming/windows.py::interval_join(how='left_outer')`` with the
batch LEFT JOIN oracle, ``txt_rrf_fusion`` over
``operators/fusion.py::rrf_fuse``, ``emb_matryoshka_profile`` over
``operators/similarity.py::matryoshka_norm_profile`` — stage-in-N,
wire-in-N+1, driver-green-in-N+1) + the full 20-query r11 cohort:
streaming 8 (4-11) + fresh 4 (12-15) + fresh8e 2 (16-17) + fresh8c 3
(18-20) + fresh8a 2 (21-22) + fresh7d 1 (23) + the oldest 27 of the
50-query r12 cohort: mrcore 9 (24-32) + pipeline 8 (33-40) +
textstats2 2 (41-42) + fresh7b 3 (43-45) + fresh8b 4 (46-49) +
fresh8d's first (50). Sums to 50 exactly; the r12 remainder (fresh8d's
tail + fresh8f/g/h/l/j) and the r13-window modules open r16. Keep the
arithmetic ledgered here when the r15 rotation lands.

r16 debut candidates, STAGED r14 with tests + drafted oracles (the
staging pattern): the mergeable fixed-range histogram sketch
(``operators/histsketch.py::histogram_sketch_rollup`` — the exactly-
mergeable quantile twin of the HLL rollup; planned
``agg_histogram_sketch_rollup`` over the events value column;
tests/test_histsketch.py) and the chained two-stateful-operator
windowed aggregate (``streaming/windows.py::two_stage_windowed_max`` —
peak 15-minute rate per hour; planned ``stream_two_stage_windowed``;
tests/test_streaming.py carries the sentinel-flushed streaming parity
AND the batch oracle draft), plus synchronous k-core peeling
(``operators/graph.py::k_core_peel`` — the link-graph density filter;
planned ``graph_k_core`` over the part co-purchase graph;
tests/test_kcore.py carries the pure-Python reference, the unrolled
per-round CTE draft, and a 30-topology fuzz sweep). Wire them past the
r15 window for first driver rows in r16 — stage-in-N, wire-in-N+1, one
round ahead.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    fresh10,       # first-ever driver rows (window 1-3)
    temporal,      # r10 rows — the stale cohort from here (window 4-8)
    advanced,      # r10 rows (window 9-15)
    similarity,    # r10 rows (window 16-24)
    multimodal2,   # r10 row (window 25)
    sinks,         # r10 rows (window 26-30)
    dedup,         # r10 rows (window 31-38)
    relational,    # r10 rows (window 39-50)
    # --- out of window from here (all driver-green r11/r12/r13,
    # re-verified at HEAD in bench_runs/verify_full_r14.json at close) ---
    fresh11,       # NEW r14 registrations — r15 window lead (debut pattern)
    streaming,     # r11 rows — r15 window (streaming-led, VERDICT r12 #7)
    fresh,         # r11 rows — r15 window
    fresh8e,       # r11 rows — r15 window
    fresh8c,       # r11 rows — r15 window
    fresh8a,       # r11 rows — r15 window
    fresh7d,       # r11 row — r15 window
    mrcore,        # §2a mr-core, r12 rows — r15 window
    pipeline,      # r12 rows — r15 window
    textstats2,    # r12 rows — r15 window
    fresh7b,       # r12 rows — r15 window
    fresh8b,       # r12 rows — r15 window
    fresh8d,       # r12 rows — r15 window head / r16
    fresh8f,       # r12 rows — r16
    fresh8g,       # r12 rows — r16
    fresh8h,       # r12 rows — r16
    fresh8l,       # r12 rows — r16
    fresh8j,       # r12 rows — r16
    graphml2,      # r13 rows (r13 window) — r16
    fresh8i,       # r13 rows — r16
    fresh8k,       # r13 rows — r16
    fresh8m,       # r13 rows — r16
    temporal2,     # r13 rows — r16
    fresh6,        # r13 rows — r16
    graphml,       # r13 rows — r16
    relational2,   # r13 rows — r16
    textstats,     # r13 rows — r16
    fresh7b2,      # r13 rows — r16
    fresh7,        # r13 row — r16
    fresh7c,       # r13 rows — r16
    fresh7e,       # r13 row — r16
    fresh7f,       # r13 rows — r16
    multimodal,    # r13 rows — r16
    fresh9,        # r13 rows (debuted r13) — r16
)
