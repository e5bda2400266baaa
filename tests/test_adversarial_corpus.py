"""Adversarial-corpus cross-engine gate for the documents-only queries.

The driver's oracle gate runs on the fixture corpus, which is pure-ASCII
and NULL-free — so regex-semantics, unicode, and NULL edges between the
Java-regex Spark side and the RE2 DuckDB side are never exercised by it
(the class behind the r10 vertical-tab and NULL-median fixes). This
suite re-runs a representative slice of the registered documents-only
queries against their OWN registered oracle SQL on a crafted corpus of
exactly those edges, comparing full result rows.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import Row

import mapreduce_system_spark.queries  # noqa: F401  (registers everything)
from mapreduce_system_spark.registry import ORACLE_SQL, QUERIES

_TEXTS = [
    None,
    "",
    "   \t\n",
    "!!! ??? ...",
    "plain ascii words the and of it is to in that",
    "tab\tsep\nnewline\x0bvtab\ffeed\rret the and",
    "café naïve résumé déjà vu the",
    "emoji \U0001f600 mixed 中文 words the and",
    "nbsp joined zero​width the of",
    "under_scores and digits 12345 67890 the",
    "UPPER lower MiXeD the THE The of OF Of",
    "x" * 400,
    "repeat me " * 60,
    "word-with-hyphens and/or slashes|pipes the",
    "quotes 'single' \"double\" `back` the and",
    "the quick brown fox jumps over the lazy dog again",
    "the quick brown fox jumps over the lazy dog anew",
    "semi;colon:colon,comma.dot the and of",
    "math 3<4 >=2 !=1 ~5 ^6 &7 *8 the",
    "brackets (a) [b] {c} <d> the and of it",
]

_QUERY_NAMES = [
    "dedup_exact",
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_cluster_survivors",
    "dedup_editdistance_pairs",
    "dedup_containment_pairs",
    "txt_token_stats",
    "txt_top_bigrams",
    "txt_shingle_novelty",
    "txt_lang_confusion",
    "txt_bpe_subword_stats",
    "txt_winnow_fingerprints",
    "txt_tfidf_top_terms",
    "txt_heavy_hitters",
    "txt_bm25_topk",
    "txt_unigram_surprisal",
    "txt_bigram_surprisal",
    "txt_bigram_cond_entropy",
    "txt_kl_divergence",
    "txt_entropy_quality",
    "txt_zipf_slope",
    "txt_ttr_lexical_diversity",
    "txt_vocab_coverage",
    "pipe_clean_corpus",
    "pipe_hash_split",
    "pipe_hash_sample",
    "pipe_weighted_sample",
    "pipe_stratified_sample",
    "pipe_chunk_documents",
    "pipe_pack_sequences",
    "pipe_decontaminate",
    "pipe_repetition_filter",
    "pipe_quota_mix",
    "pipe_source_mix_weights",
    "pipe_incremental_dedup",
    "pipe_group_kfold",
    "pipe_source_manifest",
]


@pytest.fixture(scope="module")
def adversarial_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("adversarial")
    rows = [
        Row(
            doc_id=i,
            text=t,
            lang=("en" if i % 3 else "de"),
            source=f"src{i % 4}",
            n_chars=(len(t) if t is not None else 0),
        )
        for i, t in enumerate(_TEXTS)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{d}/documents.parquet")
    return str(d)


@pytest.mark.parametrize("name", _QUERY_NAMES)
def test_documents_query_matches_oracle_on_adversarial_corpus(
    spark, adversarial_dir, name
):
    got = [tuple(r) for r in QUERIES[name](spark, adversarial_dir).collect()]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{adversarial_dir}/documents.parquet/*.parquet')"
    )
    want = [tuple(r) for r in con.execute(ORACLE_SQL[name]).fetchall()]
    # the driver's gate hashes SORTED rows (order-insensitive) — mirror
    # that: a query whose ORDER BY admits ties (pack members) may emit
    # tied rows in either order per engine
    key = repr
    assert sorted(got, key=key) == sorted(want, key=key), (
        f"{name}: spark={got[:5]}... oracle={want[:5]}..."
    )
