"""Registered query catalog, grouped by domain.

Importing this package registers every domain query (relational, text/LLM
pipeline, temporal, streaming-parity, multimodal) into
``mapreduce_system_spark.registry.QUERIES`` / ``ORACLE_SQL``. The
MapReduce-core workloads (the reference's own surface) live in
``registry.py`` itself.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness sweep covers the
first 50 registered queries in registration order. Modules whose queries
are NEW this round or have never received a driver CORRECTNESS row are
imported first; everything pushed past the window has a driver-green row
from CORRECTNESS_r03/r04.

Round-5 window (9 registry-core queries precede these, positions 1-9):

- fresh (4 new r5 queries: asof_join_salted_events, sim_recall_at_k,
  rel_window_range_frames, rel_sessionize_events) — positions 10-13;
- dedup (8) → 14-21, streaming (8) → 22-29, pipeline (8) → 30-37,
  textstats (9) → 38-46, sinks (4) → 47-50.

This rotates in ALL 11 queries that had only local verify_local + pytest
evidence after r4 (dedup_editdistance_pairs, dedup_crossmodal_agreement,
dedup_paraphrase_candidates, stream_tumbling_distinct_users,
stream_static_enrich, pipe_decontaminate, pipe_chunk_documents,
pipe_repetition_filter, pipe_quota_mix, txt_heavy_hitters,
scan_orc_roundtrip) and refreshes the rest of those modules' r03-era rows.
Rotated OUT this round (driver-green r04, code untouched except where
noted): multimodal, similarity, relational, advanced, temporal.

Out-of-window r5 change worth noting: agg_approx_quantiles' exact anchor
was rewritten from a per-group sort-buffer percentile to a rank-band
count check (queries/advanced.py) — same TRUE/TRUE output contract, hash
equality pinned by tools/verify_local.py and tests/test_relational.py
(the r4 driver row verified the same band semantics). Same precedent as
r4's dedup_cluster_survivors localCheckpoint note.

ROUND-6 ROTATION CANDIDATES: temporal's rows date from r03 (oldest in
the catalog once r5 lands); relational/advanced/multimodal/similarity
are r04-green.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    fresh,         # NEW r5: salted as-of, ANN recall@k, range frames, sessionize
    dedup,         # 5 r03-green + 3 never-driver-verified (r4 additions)
    streaming,     # 6 r03-green + 2 never-driver-verified (r4 additions)
    pipeline,      # 4 r03-green + 4 never-driver-verified (r4 additions)
    textstats,     # 8 r03-green + 1 never-driver-verified (r4 addition)
    sinks,         # 3 r04-green + scan_orc_roundtrip (never driver-verified)
    temporal,      # driver-green r03 (oldest out-of-window evidence)
    relational,    # driver-green r04
    advanced,      # driver-green r04 (agg_approx_quantiles anchor reworked r5 — see above)
    multimodal,    # driver-green r04
    similarity,    # driver-green r04
)
