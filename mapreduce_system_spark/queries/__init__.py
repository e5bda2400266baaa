"""Registered query catalog, grouped by domain.

Importing this package registers every domain query (relational, text/LLM
pipeline, temporal, streaming-parity, multimodal) into
``mapreduce_system_spark.registry.QUERIES`` / ``ORACLE_SQL``. The
MapReduce-core workloads (the reference's own surface) live in
``mrcore.py`` and import FIRST this round — their r09 driver rows hit the
rotation ledger's hard deadline, so the reference's own flagship queries
lead the r12 window. Since the r10 self-review, registration order is a
pure function of THIS import list from every entry point — see
registry.py's bottom-import comment for the mechanism.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness sweep covers the
first 50 registered queries in registration order. Modules whose queries
are NEW this round, changed this round, or carry the catalog's oldest
driver evidence are imported first; everything pushed past the window
has a fresh driver-green row from a recent CORRECTNESS_r*.json.

Round-12 window (50 slots), executing VERDICT.md r11 #1 — the entire
r08 evidence tail (mrcore/pipeline/textstats2/fresh7b/fresh8b), the
oldest r09 rows, and the r11-changed module:

- mrcore (9, r09 rows — the reference's own flagship word-count lineage,
  README.MD:25-53; ledgered hard deadline) → 1-9;
- pipeline (8, r08 rows — clean/decontaminate/pack/quota cohort) → 10-17;
- textstats2 (2, r08 rows — BM25/KL cohort) → 18-19;
- fresh7b (3, r08 rows) → 20-22;
- fresh8b (4, r08 rows — the UDF/UDTF cohort incl.
  ``udf_grouped_map_zscore`` + ``udtf_sentence_stats``) → 23-26;
- fresh8d (4, r09 rows) → 27-30;
- fresh8f (5, r09 rows) → 31-35;
- fresh8g (4, r09 rows) → 36-39;
- fresh8h (6, r09 rows) → 40-45;
- fresh8l (2, r09 rows; ``agg_mad_outliers``'s NULL-group join was
  reworked in r11 — changed code re-enters the window) → 46-47;
- fresh8j (3, r09 rows) → 48-50.

Round-13 window DRAFT (slot arithmetic — VERDICT r11 #2): the r12
registrations graphml2 2 (slots 1-2: ``graph_pagerank_personalized`` +
``basket_association_rules``, first driver rows) + the remaining r09
tail: fresh8i 4 (3-6) + fresh8k 2 (7-8) + fresh8m 3 (9-11) + temporal2 2
(12-13, ``fn_json_map_props``'s r09 row plus ``fn_math_scalar_profile``
riding along) + the r12-CHANGED module fresh6 3 (14-16: the
``_run_session_stream`` stats hook landed r12, so changed code
re-enters) + the r11 tail now two rounds old: graphml 2 (17-18) +
relational2 6 (19-24) + textstats 7 (25-31) + fresh7b2 2 (32-33) +
fresh7 1 (34) + fresh7c 2 (35-36) + fresh7e 1 (37) + fresh7f 3 (38-40) +
multimodal 5 (41-45: the GIF branch joined the default decode chain in
r12). Sums to 45, leaving 5 free slots for the r13 debuts whose
OPERATOR halves are staged with drafted oracles and 10x probes (the r12
pattern): join-cardinality estimation (``operators/cardinality.py``,
tests/test_cardinality.py, ``scale_probe_r12_card.json``) and a GIF-blob
multimodal query (``operators/multimodal.py::decode_image_gif``,
tests/test_gif.py), plus re-aggregatable HLL sketch rollup
(``operators/hll.py`` — the PERSISTED-sketch-table merge path
``approx_count_distinct`` cannot express; band-checked because
DataSketches HIP estimates are measured order-dependent,
tests/test_hll.py). ``streaming/stateful.py::read_group_state`` (the
offline state-store audit, r12) is also query-ready: a registered
``stream_state_audit`` whose oracle is the plain batch aggregate the
store must equal. A fourth candidate (sketch-verified frequent items)
was drafted and WITHDRAWN in-round: ``txt_heavy_hitters``
(queries/textstats2.py) already ships exactly that freqItems-verified
algebra — grep the catalog for the pattern before staging a "new"
operator (the hll staging did: one-shot approx_count_distinct exists,
mergeable sketch state does not).
fresh8f also changed in r12 (triangle-oracle empty-graph fix) but sits
INSIDE the r12 window, so its fresh row covers the change; streaming's
8 r11 rows become the r14 lead.

Catalog growth this round is exactly the two staged r13 debuts wired
into registered queries PAST the window (graphml2 — the stage-in-N,
wire-in-N+1, driver-green-in-N+1 pattern that worked for r10→r11):
``graph_pagerank_personalized`` (operators/graph.py::pagerank(seeds=...))
and ``basket_association_rules`` (operators/basket.py). Both carry
adversarial-corpus rows and exact DuckDB oracles at birth; they take the
r13 window's lead slots for their first driver rows.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    mrcore,        # §2a mr-core, r09 rows — HARD DEADLINE (window 1-9)
    pipeline,      # r08 rows (window 10-17)
    textstats2,    # r08 rows (window 18-19)
    fresh7b,       # r08 rows (window 20-22)
    fresh8b,       # r08 rows, UDF/UDTF cohort (window 23-26)
    fresh8d,       # r09 rows (window 27-30)
    fresh8f,       # r09 rows (window 31-35)
    fresh8g,       # r09 rows (window 36-39)
    fresh8h,       # r09 rows (window 40-45)
    fresh8l,       # r09 rows, agg_mad_outliers reworked r11 (window 46-47)
    fresh8j,       # r09 rows (window 48-50)
    # --- out of window from here (all driver-green r09/r10/r11,
    # re-verified at HEAD in bench_runs/verify_full_r12.json at close) ---
    graphml2,      # NEW r12 registrations — r13 window lead (debut pattern)
    fresh8i,       # r09 rows — r13 window
    fresh8k,       # r09 rows — r13 window
    fresh8m,       # r09 rows — r13 window
    temporal2,     # fn_json_map_props r09 — r13 window
    graphml,       # r11 rows — r13 window
    relational2,   # r11 rows — r13 window
    textstats,     # r11 rows — r13 window
    fresh7b2,      # r11 rows — r13 window
    fresh7,        # r11 row — r13 window
    fresh7c,       # r11 rows — r13 window
    fresh7e,       # r11 row — r13 window
    fresh7f,       # r11 rows — r13 window
    multimodal,    # r11 rows — r13 window
    streaming,     # r11 rows — r14 lead
    fresh,         # r11 rows
    fresh8e,       # r11 rows
    fresh8c,       # r11 rows
    fresh8a,       # r11 rows
    fresh7d,       # r11 row
    temporal,      # r10 rows
    advanced,      # r10 rows
    similarity,    # r10 rows
    relational,    # r10 rows
    dedup,         # r10 rows
    sinks,         # r10 rows
    fresh6,        # r10 rows (stateful GST + TWS pair)
    multimodal2,   # r10 row (mm_image_rgb_stats)
)
