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


def test_quota_mix_caps_each_source_exactly(spark):
    from mapreduce_system_spark.queries.pipeline import _QUOTA, q_quota_mix

    for r in q_quota_mix(spark, SF_DIR).collect():
        assert r["n_kept"] == min(_QUOTA, r["n_total"]), r
        assert r["tokens_kept"] >= r["n_kept"]  # every fixture doc has ≥1 token
        assert abs(r["kept_frac"] - round(r["n_kept"] / r["n_total"], 4)) < 1e-12


def test_chunking_covers_every_token_with_bounded_overlap(spark):
    """Chunks cover each document (sum of chunk tokens ≥ doc tokens) and
    the overlap overhead is bounded by size/stride."""
    from mapreduce_system_spark.queries.pipeline import (
        _CHUNK_SIZE,
        _CHUNK_STRIDE,
        q_chunk_documents,
    )

    docs = load_table(spark, SF_DIR, "documents", columns=["source", "text"])
    doc_tokens = {
        r["source"]: r["t"]
        for r in docs.groupBy("source")
        .agg(F.sum(TXT.token_count("text")).alias("t"))
        .collect()
    }
    rows = q_chunk_documents(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["chunk_tokens"] >= doc_tokens[r["source"]]
        assert 1.0 <= r["overlap_factor"] <= _CHUNK_SIZE / _CHUNK_STRIDE + 1e-9
        assert r["n_chunks"] >= r["n_docs"]


def test_decontaminate_flags_a_planted_benchmark_copy(spark, tmp_path):
    """A corpus doc that is a verbatim copy of a benchmark doc MUST be
    flagged. Built by copying one bench-split doc's text onto a corpus
    doc id in a staged parquet fixture."""
    import pyspark.sql.functions as SF

    from mapreduce_system_spark.queries.pipeline import q_decontaminate

    docs = load_table(spark, SF_DIR, "documents")
    nib = SF.substring(SF.md5(SF.col("doc_id").cast("string")), 1, 1)
    bench_text = (
        docs.where(nib == "f").select("text").orderBy("doc_id").first()["text"]
    )
    corpus_victim = docs.where(nib != "f").select("doc_id").orderBy("doc_id").first()["doc_id"]
    planted = docs.withColumn(
        "text", SF.when(SF.col("doc_id") == corpus_victim, SF.lit(bench_text)).otherwise(SF.col("text"))
    )
    staged = str(tmp_path / "planted")
    planted.write.mode("overwrite").parquet(staged + "/documents.parquet")
    out = {r["source"]: r["n_contaminated"] for r in q_decontaminate(spark, staged).collect()}
    victim_source = docs.where(SF.col("doc_id") == corpus_victim).first()["source"]
    assert out[victim_source] >= 1


def test_repetition_rates_are_consistent_ratios(spark):
    from mapreduce_system_spark.queries.pipeline import q_repetition_filter

    rows = q_repetition_filter(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0.0 <= r["dup_token_rate"] <= 1.0
        assert 0.0 <= r["dup_bigram_rate"] <= 1.0
        assert 0 <= r["n_flagged"] <= r["n_docs"]
    # word-soup fixture: tokens repeat within docs, so the corpus-level
    # duplicate-token rate must be clearly positive somewhere
    assert max(r["dup_token_rate"] for r in rows) > 0.0
