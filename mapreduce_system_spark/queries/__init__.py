"""Registered query catalog, grouped by domain.

Importing this package registers every domain query (relational, text/LLM
pipeline, temporal, streaming-parity, multimodal) into
``mapreduce_system_spark.registry.QUERIES`` / ``ORACLE_SQL``. The
MapReduce-core workloads (the reference's own surface) live in
``mrcore.py`` and import LAST again this round (r09 driver rows; they
lead the r12 window — hard deadline per the rotation ledger). Since the
r10 self-review, registration order is a pure function of THIS import
list from every entry point — see registry.py's bottom-import comment
for the mechanism.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness sweep covers the
first 50 registered queries in registration order. Modules whose queries
are NEW this round, changed this round, or carry the catalog's oldest
driver evidence are imported first; everything pushed past the window
has a fresh driver-green row from a recent CORRECTNESS_r*.json.

Round-11 window (50 slots), executing VERDICT.md r10 #1/#2 — the two
staged debuts, the entire 22-row r07 evidence tail, the late-r10-changed
modules, and the r08 streaming/fresh cohort:

- graphml (NEW ``graph_pagerank_weighted`` + ``emb_pca_topk_deflation``,
  operators staged r10) → 1-2;
- relational2 (6, r07 rows) → 3-8;
- textstats (7, r07 rows) → 9-15;
- fresh7b2 (2, r07 rows) → 16-17;
- fresh7 (1, r07 row) → 18;
- fresh7c (2, r07 rows) → 19-20;
- fresh7e (1, r07 row) → 21;
- fresh7f (3, r07 rows) → 22-24;
- multimodal (5, r09 rows; JPEG decoder gained chroma + bomb bounds
  late-r10 — changed code re-enters the window) → 25-29;
- streaming (8, r08 rows) → 30-37;
- fresh (4, r08 rows; includes the two r10 bench movers-on-watch
  ``sim_recall_at_k`` + ``asof_join_salted_events``) → 38-41;
- fresh8e (2, r08 rows; oracles changed late-r10) → 42-43;
- fresh8c (3, r08 rows; dedup_containment_pairs hardened late-r10)
  → 44-46;
- fresh8a (2, r08 rows; merge-sink try/finally reworked late-r10)
  → 47-48;
- fresh7d (1, r08 row; graph_pagerank — the unweighted twin of this
  round's debut) → 49;
- temporal2 (first query ``fn_math_scalar_profile`` → 50;
  ``fn_json_map_props`` stays r09-green just past the line).

Round-12 window DRAFT (slot arithmetic sums to 50 — VERDICT r10 #6):
mrcore 9 (slots 1-9, the hard deadline: the reference's own flagship
queries) + pipeline 8 (10-17, r08) + textstats2 2 (18-19, r08) +
fresh7b 3 (20-22, r08) + fresh8b 4 (23-26, r08) + fresh8d 4 (27-30) +
fresh8f 5 (31-35) + fresh8g 4 (36-39) + fresh8h 6 (40-45) + fresh8l 2
(46-47 — agg_mad_outliers' NULL-group join changed in r11, so changed
code re-enters) + fresh8j 3 (48-50). That clears every row ≤ r08, the
r11 change, and the oldest r09 rows; the r13 window then takes the
remaining r09 tail (fresh8i, fresh8k, fresh8m, temporal2's second
query) plus whatever r12 changes — rotation debt stays bounded at two
rounds for everything except the explicitly-ledgered overflow.

Catalog growth this round is exactly the 2 in-window debuts (multi-batch
growth stays paused until the r12 draft's math clears — VERDICT r10 #9).
The OPERATOR halves of two r13 debut candidates are staged and
pytest-pinned with their future oracles already drafted (the same
pattern that staged this round's debuts in r10): personalized PageRank
(``operators/graph.py::pagerank(seeds=...)``,
tests/test_graph.py::test_personalized_pagerank_matches_unrolled_duckdb_recurrence)
and market-basket association rules (``operators/basket.py``,
tests/test_basket.py::test_association_rules_match_unrolled_duckdb) —
the r13 batch wires registered queries + oracles into the ~35 free
slots left after the r09-tail rotation.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    graphml,       # NEW r11 debuts: weighted PageRank + top-k PCA (window 1-2)
    relational2,   # r07 rows (window 3-8)
    textstats,     # r07 rows (window 9-15)
    fresh7b2,      # r07 rows (window 16-17)
    fresh7,        # r07 row (window 18)
    fresh7c,       # r07 rows (window 19-20)
    fresh7e,       # r07 row (window 21)
    fresh7f,       # r07 rows (window 22-24)
    multimodal,    # r09 rows, JPEG chroma landed r10 (window 25-29)
    streaming,     # r08 rows (window 30-37)
    fresh,         # r08 rows incl. the two bench movers-on-watch (window 38-41)
    fresh8e,       # r08 rows, oracles changed late-r10 (window 42-43)
    fresh8c,       # r08 rows, containment hardened late-r10 (window 44-46)
    fresh8a,       # r08 rows, merge sink reworked late-r10 (window 47-48)
    fresh7d,       # r08 row, graph_pagerank (window 49)
    temporal2,     # fn_math_scalar_profile (window 50); fn_json_map_props r09
    # --- out of window from here (all driver-green r09/r10, re-verified
    # at HEAD in bench_runs/verify_full_r11.json at round close) ---
    temporal,      # r10 rows
    advanced,      # r10 rows
    similarity,    # r10 rows
    relational,    # r10 rows
    dedup,         # r10 rows
    sinks,         # r10 rows
    fresh6,        # r10 rows (stateful GST + TWS pair)
    multimodal2,   # r10 row (mm_image_rgb_stats)
    pipeline,      # r08 rows — r12 window (slots 10-17)
    textstats2,    # r08 rows — r12 window
    fresh7b,       # r08 rows — r12 window
    fresh8b,       # r08 rows — r12 window
    fresh8d,       # r09 rows — r12 window
    fresh8f,       # r09 rows — r12 window
    fresh8g,       # r09 rows — r12 window
    fresh8h,       # r09 rows — r12 window
    fresh8i,       # r09 rows — r12 window
    fresh8j,       # r09 rows — r12 window (first query) / r13
    fresh8k,       # r09 rows — r13
    fresh8l,       # r09 rows (agg_mad_outliers NULL-group fix r11) — r13
    fresh8m,       # r09 rows — r13
    mrcore,        # §2a mr-core — r09 rows; LEADS the r12 window (1-9)
)
