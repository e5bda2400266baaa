"""Registered query catalog, grouped by domain.

Importing this package registers every domain query (relational, text/LLM
pipeline, temporal, streaming-parity, multimodal) into
``mapreduce_system_spark.registry.QUERIES`` / ``ORACLE_SQL``. The
MapReduce-core workloads (the reference's own surface) live in
``mrcore.py`` and import LAST this round (fresh r09 driver rows; rotate
back into the window by r12). Since the r10 self-review, registration
order is a pure function of THIS import list from every entry point —
see registry.py's bottom-import comment for the mechanism.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness sweep covers the
first 50 registered queries in registration order. Modules whose queries
are NEW this round, changed this round, or carry the catalog's oldest
driver evidence are imported first; everything pushed past the window
has a fresh driver-green row from a recent CORRECTNESS_r*.json.

Round-10 window (50 slots, mr-core moved past the window), executing
VERDICT.md r9 #1 — the 31 r06-stale rows rotate in, plus the oldest-r07
modules the late-r9 hardening touched (dedup, sinks, both stateful
streaming queries), plus this round's new queries:

- temporal (5 after the temporal2 split: the 4 r06-stale rows +
  ``fn_json_props``, whose oracle gained TRY_CAST per r9 ADVICE —
  changed code re-enters the window) → 1-5;
- advanced (7, r06 rows) → 6-12;
- similarity (8 r06 rows + NEW ``sim_topk_pq``) → 13-21;
- relational (12, r06 rows) → 22-33;
- dedup (8, r07 rows; API edges hardened late-r9) → 34-41;
- sinks (5, r07 rows; URI-safe staging reap hardened late-r9, reap
  prefix API changed r10) → 42-46;
- fresh6 (2 r07 rows — both stateful streaming queries, session
  edge-semantics fixed late-r9 — + NEW ``stream_stateful_sessions_tws``)
  → 47-49;
- multimodal2 (NEW ``mm_image_rgb_stats``, the JPEG-chroma surface)
  → 50.

Out of window this round (all driver-green r07-r09 and re-verified at
HEAD in bench_runs/verify_full_r10.json): temporal2 (r09 rows, split
out unchanged), multimodal (r09 rows; the JPEG decoder gains chroma
r10 — rotate r11 with a driver row for the whole module), then the
remaining r07 cohort for r11 (relational2, textstats, fresh7b2,
fresh7, fresh7c, fresh7e, fresh7f — ~22 rows), then the r08/r09-green
modules and finally the mr-core 9 (r09 rows, mrcore.py — rotate by
r12). Catalog growth this round is exactly the 3 new in-window
queries (VERDICT r9 #2/#3/#4); multi-batch growth resumes r11+ per
VERDICT r9 #8 once the evidence tail is trimmed. The OPERATOR halves of
the planned r11 debuts are already staged and pytest-pinned — weighted
PageRank (``operators/graph.py::pagerank(weight=...)``,
tests/test_graph.py) and top-k PCA via deflation (``operators/pca.py``,
numpy-anchored tests/test_pca.py) — so the r11 batch only wires
registered queries + unrolled oracles and rotates them in-window.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    temporal,      # r06 rows + fn_json_props oracle TRY_CAST change (r10 window 1-5)
    advanced,      # r06 rows (window 6-12)
    similarity,    # r06 rows + NEW sim_topk_pq (window 13-21)
    relational,    # r06 rows (window 22-33)
    dedup,         # r07 rows, late-r9 API hardening (window 34-41)
    sinks,         # r07 rows, reap-prefix API changed r10 (window 42-46)
    fresh6,        # r07 rows, stateful pair + NEW tws twin (window 47-49)
    multimodal2,   # NEW mm_image_rgb_stats (window 50)
    # --- out of window from here ---
    temporal2,     # r09 rows (split out of temporal, unchanged code)
    multimodal,    # r09 rows; JPEG chroma lands r10 — rotate r11
    relational2,   # r07 rows — rotate r11
    textstats,     # r07 rows — rotate r11
    fresh7b2,      # r07 rows — rotate r11
    fresh7,        # r07 rows — rotate r11
    fresh7c,       # r07 rows — rotate r11
    fresh7e,       # r07 rows — rotate r11
    fresh7f,       # r07 rows — rotate r11
    pipeline,      # driver-green r08
    streaming,     # driver-green r08
    fresh,         # driver-green r08
    textstats2,    # driver-green r08
    fresh7b,       # driver-green r08
    fresh7d,       # driver-green r08
    fresh8a,       # driver-green r08
    fresh8b,       # driver-green r08
    fresh8c,       # driver-green r08
    fresh8e,       # driver-green r08
    fresh8d,       # driver-green r09
    fresh8f,       # driver-green r09
    fresh8g,       # driver-green r09
    fresh8h,       # driver-green r09
    fresh8i,       # driver-green r09
    fresh8j,       # driver-green r09
    fresh8k,       # driver-green r09
    fresh8l,       # driver-green r09
    fresh8m,       # driver-green r09
    mrcore,        # §2a mr-core — r09 rows; LAST this round, rotate by r12
)
