"""sf0.1 → sf1 scaling probe for the heavy candidate-generating queries.

VERDICT r6 #3: the 100 TB argument for the dedup/similarity surface was
architectural (every candidate generator is an equi-join on a bounded
key); this probe turns it into a measurement by running the six heaviest
candidate-generating queries at sf0.1 and at a 10× corpus, recording
wall time AND candidate-pair counts, so growth in cost is attributable
to growth in candidates (the linear-scale hypothesis) rather than plan
pathology (superlinear blowup ⇒ a band/cap mis-sizing invisible at
sf0.1).

The 10× corpus (no sf1 fixture is provided) is built as TEN DISJOINT
SHARDS each statistically identical to sf0.1: replica r of a document
prefixes every token with ``r{r}x`` (so shards share no shingles and no
near-dup pairs cross shards — shard 0 is sf0.1 verbatim), and replica r
of an embedding gets a disjoint label space (labels + r*1000) plus a
≤5e-4 deterministic per-component jitter (so blocked-cosine pair
structure is per-shard and clone ties are broken). Under this
construction every candidate count must grow exactly ~10×; wall time is
then the free variable the probe measures. A generator-grade sf1 (10×
docs in ONE shard) would additionally grow per-key bucket sizes — that
regime is covered by the stop-shingle DF cap and the banding math
documented in operators/dedup.py; what this probe can falsify is the
runtime-vs-candidates relation.

Usage::

    python tools/scale_probe.py [reps] [src_sf_dir]

Writes the record to bench_runs/scale_probe_r7.json and prints a
markdown table (consumed by BASELINE.md §(h)).
"""

from __future__ import annotations

import json
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from mapreduce_system_spark import caches  # noqa: E402
from mapreduce_system_spark.operators import dedup as DD  # noqa: E402
from mapreduce_system_spark.operators import similarity as SIM  # noqa: E402
from mapreduce_system_spark.queries.dedup import _MAX_SHINGLE_DF  # noqa: E402
from mapreduce_system_spark.session import get_spark  # noqa: E402
from mapreduce_system_spark.sources.tables import load_table  # noqa: E402

HEAVY = [
    "dedup_jaccard_pairs",
    "dedup_minhash_lsh",
    "dedup_cluster_survivors",
    "dedup_crossmodal_agreement",
    "dedup_paraphrase_candidates",
    "sim_topk_lsh",
]

_OFFSET = 10_000_000  # id offset per replica — far above any fixture id


def build_scaled(spark, src: str, dst: str, reps: int, organic_pct: int = 0) -> None:
    """Write the sharded 10× documents + embeddings tables under dst.

    ``organic_pct`` > 0 switches on the ORGANIC-collision variant
    (VERDICT r7 #5 / BASELINE §(j)): that percentage of documents —
    selected by a hash of doc_id, so the same docs in every shard —
    replicate WITHOUT the ``r{r}x`` token prefix (doc_id still offset),
    and the matching embeddings keep their ORIGINAL label (jitter still
    applied). Those rows collide across shards: each organic doc's
    shingles gain ~reps× document frequency (bucket DEPTH growth, not
    just bucket count) and each forms a C(reps,2) cross-shard near-dup
    clique — the per-key regime the disjoint-shard probe admits it
    cannot exercise."""
    docs = load_table(spark, src, "documents")
    embs = load_table(spark, src, "embeddings")
    organic_doc = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(100)) < organic_pct
    organic_vec = F.pmod(F.xxhash64(F.col("vec_id")), F.lit(100)) < organic_pct
    doc_parts = []
    emb_parts = []
    for r in range(reps):
        if r == 0:
            doc_parts.append(docs)
            emb_parts.append(embs)
            continue
        tagged = F.when(organic_doc, F.col("text")).otherwise(
            F.regexp_replace("text", r"(\w+)", f"r{r}x$1")
        )
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + r * _OFFSET).alias("doc_id"),
                tagged.alias("text"),
                "lang",
                "source",
                F.length(tagged).alias("n_chars"),
            )
        )
        # jitter breaks exact clone ties without moving any vector more
        # than ~3e-3 in L2 (64 dims × 5e-4) — per-shard pair structure
        # stays that of sf0.1
        jit = F.transform(
            "embedding",
            lambda x, i: x
            + (
                (F.pmod(F.xxhash64(F.col("vec_id"), i, F.lit(r)), F.lit(1000)).cast("double") - 500.0)
                * 1e-6
            ).cast("float"),
        )
        emb_parts.append(
            embs.select(
                (F.col("vec_id") + r * _OFFSET).alias("vec_id"),
                jit.alias("embedding"),
                F.when(organic_vec, F.col("label"))
                .otherwise(F.col("label") + r * 1000)
                .alias("label"),
            )
        )
    out_docs = doc_parts[0]
    for p in doc_parts[1:]:
        out_docs = out_docs.unionByName(p)
    out_embs = emb_parts[0]
    for p in emb_parts[1:]:
        out_embs = out_embs.unionByName(p)
    out_docs.repartition(8).write.mode("overwrite").parquet(f"{dst}/documents.parquet")
    out_embs.repartition(4).write.mode("overwrite").parquet(f"{dst}/embeddings.parquet")


def _pairs_in_groups(counts, col="c"):
    """Σ C(n, 2) over a DataFrame of group sizes."""
    row = counts.agg(F.sum(F.col(col) * (F.col(col) - 1) / 2)).collect()[0][0]
    return int(row or 0)


def shingle_candidates(spark, sf_dir: str) -> int:
    """Capped shingle-share candidate pairs (upper bound: the in-join
    length-ratio prefilter is not applied here). Drives jaccard, cluster
    survivors, and crossmodal."""
    sets = DD.shingle_sets(load_table(spark, sf_dir, "documents", columns=["doc_id", "text"]))
    ex = sets.select("id", F.explode("sg").alias("shingle"))
    df_ = ex.groupBy("shingle").agg(F.count("*").alias("c")).where(
        F.col("c") <= _MAX_SHINGLE_DF
    )
    return _pairs_in_groups(df_)


def shingle_df_profile(spark, sf_dir: str) -> dict:
    """Shingle document-frequency distribution — the per-key bucket-DEPTH
    record the organic probe exists to produce (BASELINE §(j)): if depth
    grows while wall time tracks candidate counts, the equi-join scale
    argument holds in the regime the disjoint-shard probe can't reach."""
    sets = DD.shingle_sets(
        load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    )
    ex = sets.select("id", F.explode("sg").alias("shingle"))
    dfc = ex.groupBy("shingle").agg(F.count("*").alias("c"))
    row = dfc.agg(
        F.expr("percentile_approx(c, array(0.5, 0.9, 0.99), 10000)").alias("p"),
        F.max("c").alias("mx"),
        F.count("*").alias("n"),
        F.count_if(F.col("c") > _MAX_SHINGLE_DF).alias("capped"),
    ).collect()[0]
    return {
        "n_shingles": int(row["n"]),
        "df_p50": int(row["p"][0]),
        "df_p90": int(row["p"][1]),
        "df_p99": int(row["p"][2]),
        "df_max": int(row["mx"]),
        "over_cap": int(row["capped"]),
    }


def minhash_band_candidates(spark, sf_dir: str) -> int:
    """Σ C(bucket, 2) over (band_idx, band_key) — the LSH candidate volume
    BEFORE the pair-distinct (same banding as minhash_lsh_pairs: 128
    hashes, 64 bands × 2 rows)."""
    docs = load_table(spark, sf_dir, "documents", columns=["doc_id", "text"])
    sig = DD.minhash_signatures(docs, n=3, num_hashes=128)
    band_cols = [
        F.xxhash64(F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}"), F.lit(b)).alias(f"b{b}")
        for b in range(64)
    ]
    bands = sig.select("id", F.posexplode(F.array(*band_cols)).alias("band_idx", "band_key"))
    counts = bands.groupBy("band_idx", "band_key").agg(F.count("*").alias("c"))
    return _pairs_in_groups(counts)


def label_block_candidates(spark, sf_dir: str) -> int:
    """Σ C(block, 2) over embedding labels — cosine_dup_pairs' candidate
    volume (drives the paraphrase query's embedding side)."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["label"])
    return _pairs_in_groups(emb.groupBy("label").agg(F.count("*").alias("c")))


def lsh_table_candidates(spark, sf_dir: str) -> int:
    """Σ corpus_bucket × query_bucket over (table, bucket) — sim_topk_lsh's
    candidate volume before the pair-distinct (2 tables, 4 planes)."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = emb.where(F.col("vec_id") < 10)
    csig = SIM.lsh_signatures(emb, 64, n_planes=4, n_tables=2, id_col="vec_id")
    qsig = SIM.lsh_signatures(q, 64, n_planes=4, n_tables=2, id_col="vec_id")
    cc = csig.groupBy("t", "bucket").agg(F.count("*").alias("nc"))
    qc = qsig.groupBy("t", "bucket").agg(F.count("*").alias("nq"))
    row = (
        cc.join(qc, ["t", "bucket"])
        .agg(F.sum(F.col("nc") * F.col("nq")))
        .collect()[0][0]
    )
    return int(row or 0)


CANDIDATE_FNS = {
    "dedup_jaccard_pairs": shingle_candidates,
    "dedup_minhash_lsh": minhash_band_candidates,
    "dedup_cluster_survivors": shingle_candidates,
    "dedup_crossmodal_agreement": shingle_candidates,
    "dedup_paraphrase_candidates": lambda s, d: label_block_candidates(s, d)
    + shingle_candidates(s, d),
    "sim_topk_lsh": lsh_table_candidates,
}


def time_queries(spark, sf_dir: str, runs: int = 3) -> dict[str, float]:
    """Median-of-runs per query (BASELINE §(e): ±30% co-tenant noise)."""
    import statistics

    qs = entry_mod.queries()
    series: dict[str, list[float]] = {n: [] for n in HEAVY}
    for _ in range(runs):
        for name in HEAVY:
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            series[name].append(time.time() - t0)
            caches.release()
    return {n: round(statistics.median(v), 3) for n, v in series.items()}


def main() -> int:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    organic_pct = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    dst = "/tmp/spark_graft_scale/sf1"

    spark = get_spark("scale_probe")
    print(
        f"# building {reps}x corpus at {dst} from {src} (organic {organic_pct}%)",
        file=sys.stderr,
    )
    build_scaled(spark, src, dst, reps, organic_pct=organic_pct)

    # one untimed warm-up sweep so the first timed scale doesn't absorb
    # JVM/codegen/Python-worker cold start (visible as sub-1.0 time
    # ratios in a dry run without it)
    print("# warm-up sweep", file=sys.stderr)
    time_queries(spark, src, runs=1)

    record: dict = {
        "reps": reps,
        "src": src,
        "organic_pct": organic_pct,
        "queries": {},
        "shingle_df": {},
    }
    for label, d in [("sf0.1", src), ("sf1", dst)]:
        print(f"# timing {label}", file=sys.stderr)
        times = time_queries(spark, d)
        cands = {}
        for name in HEAVY:
            cands[name] = CANDIDATE_FNS[name](spark, d)
            caches.release()
        record["shingle_df"][label] = shingle_df_profile(spark, d)
        caches.release()
        for name in HEAVY:
            record["queries"].setdefault(name, {})[label] = {
                "sec": times[name],
                "candidates": cands[name],
            }

    print("| query | sf0.1 s | sf1 s | time × | sf0.1 cand | sf1 cand | cand × |")
    print("|---|---|---|---|---|---|---|")
    for name in HEAVY:
        a, b = record["queries"][name]["sf0.1"], record["queries"][name]["sf1"]
        tr = b["sec"] / a["sec"] if a["sec"] else float("nan")
        cr = b["candidates"] / a["candidates"] if a["candidates"] else float("nan")
        record["queries"][name]["time_ratio"] = round(tr, 2)
        record["queries"][name]["cand_ratio"] = round(cr, 2)
        print(
            f"| {name} | {a['sec']} | {b['sec']} | {tr:.2f} | "
            f"{a['candidates']} | {b['candidates']} | {cr:.2f} |"
        )

    print("| scale | shingles | df p50 | df p90 | df p99 | df max | >cap |")
    print("|---|---|---|---|---|---|---|")
    for label in ("sf0.1", "sf1"):
        s = record["shingle_df"][label]
        print(
            f"| {label} | {s['n_shingles']} | {s['df_p50']} | {s['df_p90']} | "
            f"{s['df_p99']} | {s['df_max']} | {s['over_cap']} |"
        )

    name = "scale_probe_r8_organic.json" if organic_pct else "scale_probe_r7.json"
    out = REPO / "bench_runs" / name
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(record, indent=1, sort_keys=True) + "\n")
    print(f"# wrote {out}", file=sys.stderr)
    shutil.rmtree("/tmp/spark_graft_scale", ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
