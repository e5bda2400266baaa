"""Registered query catalog, grouped by domain.

Importing this package registers every domain query (relational, text/LLM
pipeline, temporal, streaming-parity, multimodal) into
``mapreduce_system_spark.registry.QUERIES`` / ``ORACLE_SQL``. The
MapReduce-core workloads (the reference's own surface) live in
``registry.py`` itself.
"""

from __future__ import annotations

from mapreduce_system_spark.queries import (  # noqa: F401
    advanced,
    dedup,
    multimodal,
    relational,
    similarity,
    streaming,
    temporal,
    textstats,
)
