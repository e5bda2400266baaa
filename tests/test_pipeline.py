"""Invariants for the composite training-data-pipeline queries.

The DuckDB oracle checks exact values; these assert the *semantic*
properties that make the results meaningful (conservation, contiguity,
subset-ness) at sf0.001.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_system_spark.functions import text as TXT
from mapreduce_system_spark.queries.pipeline import q_clean_corpus, q_pack_sequences
from mapreduce_system_spark.sources.tables import load_table
from tests.conftest import SF_DIR


def test_pack_sequences_conserves_tokens_and_is_contiguous(spark):
    docs = load_table(spark, SF_DIR, "documents", columns=["source", "doc_id", "text"])
    total = docs.select(F.sum(TXT.token_count("text")).alias("t")).first()["t"]
    packed = q_pack_sequences(spark, SF_DIR)
    rows = packed.collect()
    # conservation: every token lands in exactly one sequence
    assert sum(r["seq_tokens"] for r in rows) == total
    # per-source contiguity: seq ids are 0..max with no gaps
    by_source: dict[str, list[int]] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r["seq_id"])
    for source, ids in by_source.items():
        assert sorted(ids) == list(range(len(ids))), source


def test_clean_corpus_keeps_a_nonempty_bounded_subset(spark):
    docs = load_table(spark, SF_DIR, "documents", columns=["source", "doc_id", "text"])
    cleaned = q_clean_corpus(spark, SF_DIR)
    per_source_total = {
        r["source"]: r["n"] for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for r in cleaned.collect():
        assert 0 < r["n_docs_kept"] <= per_source_total[r["source"]]
        assert r["tokens_kept"] > 0
