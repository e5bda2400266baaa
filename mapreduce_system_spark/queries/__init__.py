"""Registered query catalog, grouped by domain.

Importing this package registers every domain query (relational, text/LLM
pipeline, temporal, streaming-parity, multimodal) into
``mapreduce_system_spark.registry.QUERIES`` / ``ORACLE_SQL``. The
MapReduce-core workloads (the reference's own surface) live in
``registry.py`` itself.

IMPORT ORDER IS LOAD-BEARING: the driver's correctness sweep covers the
first 50 registered queries in registration order. Modules whose queries
most need a fresh driver correctness row this round (changed semantics,
new oracles, or no row yet in any CORRECTNESS_r*.json) are imported
first; queries pushed past the window all have driver-green rows in
CORRECTNESS_r02.json, so nothing loses its on-record evidence.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    temporal,      # asof (fixed r3), range join, date/json/math fns — no r02 rows
    textstats,     # txt_* (tfidf reworked r3) + Python UDTF (new r3) — no r02 rows
    pipeline,      # pack/clean/sample/grouped-map pipelines (all new r3)
    sinks,         # partitioned-sink + csv/json scan round trips (new r3)
    streaming,     # session/dedup/totals tail had no r02 rows; interval join new r3
    dedup,         # jaccard cap, simhash exact oracle, cluster survivors (r3)
    similarity,    # emb_random_projection_profile fixed r3; multi-table LSH r3
    relational,    # all driver-green r02; first rows re-verify in-window
    advanced,      # driver-green r02
    multimodal,    # driver-green/rows-only r02
)
