"""Similarity search: exactness of brute force, recall of IVF/LSH."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_system_spark.functions.vectors import cosine
from mapreduce_system_spark.operators import similarity as SIM
from mapreduce_system_spark.sources.tables import load_table


def _queries(emb, n=10):
    return emb.where(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def test_cosine_self_similarity_and_symmetry(spark):
    df = spark.createDataFrame([([1.0, 2.0, 3.0], [3.0, 2.0, 1.0])], ["a", "b"])
    row = df.select(
        cosine(F.col("a"), F.col("a")).alias("self"),
        cosine(F.col("a"), F.col("b")).alias("ab"),
        cosine(F.col("b"), F.col("a")).alias("ba"),
        cosine(F.col("a"), F.array([F.lit(0.0)] * 3)).alias("zero"),
    ).collect()[0]
    assert abs(row.self - 1.0) < 1e-12
    assert abs(row.ab - row.ba) < 1e-15
    assert row.zero == 0.0


def test_brute_force_topk_is_exact(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    got = SIM.brute_force_topk(emb, _queries(emb, 3), k=2).collect()
    # verify one query against a hand computation
    rows = {(r.query_id, r.rn): (r.vec_id, r.cos) for r in got}
    assert len(rows) == 6
    # top-1 must have cosine >= top-2 for each query
    for q in range(3):
        assert rows[(q, 1)][1] >= rows[(q, 2)][1]


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    q = _queries(emb, 10)
    exact = {
        (r.query_id, r.vec_id) for r in SIM.brute_force_topk(emb, q, k=5).collect()
    }
    approx = {(r.query_id, r.vec_id) for r in SIM.ivf_topk(emb, q, k=5, nprobe=3).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"IVF recall {recall} collapsed"


def test_lsh_candidates_share_bucket_and_rank_correctly(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _queries(emb, 5)
    got = SIM.lsh_bucket_topk(emb, q, k=5, n_planes=4).collect()
    assert len(got) > 0
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append((r.rn, r.cos))
    for rows in by_q.values():
        rows.sort()
        cosines = [c for _, c in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_cosine_dup_pairs_blocked(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.01], 0),   # near-dup of 1, same block
            (3, [0.0, 1.0], 0),    # same block, dissimilar
            (4, [1.0, 0.0], 1),    # identical to 1 but different block → not a candidate
        ],
        ["vec_id", "embedding", "label"],
    )
    got = {(r.id_a, r.id_b) for r in SIM.cosine_dup_pairs(df, threshold=0.95).collect()}
    assert got == {(1, 2)}


def test_random_projection_preserves_distances(spark, sf_dir):
    """JL lemma sanity: 64→16 projection keeps pairwise distances within a
    loose relative band, and the norm-ratio distribution centers near 1."""
    import numpy as np

    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"]).limit(50)
    proj = SIM.random_projection(emb, in_dim=64, out_dim=16)
    rows = proj.join(emb, "vec_id").select("vec_id", "embedding", "projected").collect()
    orig = {r.vec_id: np.asarray(r.embedding, dtype=float) for r in rows}
    low = {r.vec_id: np.asarray(r.projected, dtype=float) for r in rows}
    ids = sorted(orig)[:20]
    ratios = []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            d0 = np.linalg.norm(orig[ids[i]] - orig[ids[j]])
            d1 = np.linalg.norm(low[ids[i]] - low[ids[j]])
            if d0 > 0:
                ratios.append(d1 / d0)
    ratios = np.asarray(ratios)
    assert 0.8 < ratios.mean() < 1.2, ratios.mean()
    assert (ratios > 0.3).all() and (ratios < 2.0).all()


def test_cosine_dup_pairs_arrow_matches_jvm(spark, sf_dir):
    from mapreduce_system_spark.operators.similarity import (
        cosine_dup_pairs,
        cosine_dup_pairs_arrow,
    )
    from mapreduce_system_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    jvm = {
        (r.id_a, r.id_b): round(r.cos, 6)
        for r in cosine_dup_pairs(emb, threshold=0.4).collect()
    }
    arrow = {
        (r.id_a, r.id_b): round(r.cos, 6)
        for r in cosine_dup_pairs_arrow(emb, threshold=0.4).collect()
    }
    assert jvm == arrow and len(jvm) > 0


def test_lsh_bucket_single_fold_matches_per_plane_folds(spark, sf_dir):
    """The one-pass n_planes-wide-accumulator bucket must be bit-identical
    to the textbook per-plane fold it replaced (same sequential sum order
    per plane, so the sign bits cannot differ)."""
    from mapreduce_system_spark.operators.similarity import hyperplanes, lsh_bucket

    def per_plane_bucket(vec, planes):
        bucket = F.lit(0)
        for i, p in enumerate(planes):
            proj = F.aggregate(
                F.zip_with(
                    vec,
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda a, b: a.cast("double") * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
        return bucket

    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    planes = hyperplanes(64, 6, seed=7)
    rows = emb.select(
        "vec_id",
        lsh_bucket(F.col("embedding"), planes).alias("new"),
        per_plane_bucket(F.col("embedding"), planes).alias("old"),
    ).collect()
    assert len(rows) > 0
    assert all(r.new == r.old for r in rows)


def test_label_centroids_matches_numpy_means(spark, sf_dir):
    """The posexplode partial-agg centroid derivation equals per-label
    numpy means (modulo float-sum order)."""
    import numpy as np

    from mapreduce_system_spark.operators.similarity import label_centroids

    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    got = {r[0]: np.asarray(r[1]) for r in label_centroids(emb).collect()}
    rows = emb.collect()
    by_label: dict[int, list] = {}
    for r in rows:
        by_label.setdefault(r.label, []).append(np.asarray(r.embedding, dtype=np.float64))
    assert set(got) == set(by_label)
    for lbl, vecs in by_label.items():
        want = np.mean(vecs, axis=0)
        assert np.allclose(got[lbl], want, rtol=1e-9, atol=1e-12), lbl


def test_ivf_exact_config_equals_brute_force(spark, sf_dir):
    """nprobe = label cardinality ⇒ IVF degenerates to brute force —
    identical (query, vec, rn) triples, not merely overlapping sets."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding", "label"])
    q = _queries(emb, 10)
    exact = {(r.query_id, r.vec_id, r.rn) for r in SIM.brute_force_topk(emb, q, k=5).collect()}
    ivf = {(r.query_id, r.vec_id, r.rn) for r in SIM.ivf_topk(emb, q, k=5, nprobe=10).collect()}
    assert exact == ivf and len(exact) > 0


def test_lsh_multi_table_recall_is_monotone(spark, sf_dir):
    """OR-amplification: unioning candidates from independent hash tables
    can only add candidates, so top-k recall vs brute force is monotone
    non-decreasing in n_tables (and strictly useful on this fixture)."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _queries(emb, 10)
    exact = {
        (r.query_id, r.vec_id) for r in SIM.brute_force_topk(emb, q, k=5).collect()
    }

    def recall(n_tables):
        approx = {
            (r.query_id, r.vec_id)
            for r in SIM.lsh_bucket_topk(
                emb, q, k=5, n_planes=4, n_tables=n_tables
            ).collect()
        }
        return len(exact & approx) / len(exact)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1, (r1, r3)
    assert r3 >= 0.3, f"3-table LSH recall {r3} collapsed"


def test_lsh_topk_dedupes_precomputed_multitable_candidates(spark, sf_dir):
    """Passing 3-table precomputed signatures while n_tables stays at its
    default must NOT produce duplicate neighbors: a pair colliding in
    all 3 tables used to be scored 3 times, and row_number handed one
    neighbor several of the k slots. Top-k rows must be one per distinct
    (query, neighbor)."""
    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _queries(emb, 5)
    csig = SIM.lsh_signatures(emb, 64, n_planes=2, n_tables=3, id_col="vec_id")
    qsig = SIM.lsh_signatures(
        q, 64, n_planes=2, n_tables=3, id_col="query_id", vec_col="query_vec"
    )
    got = SIM.lsh_bucket_topk(
        emb, q, k=5, corpus_sig=csig, query_sig=qsig  # n_tables left at default
    ).collect()
    pairs = [(r.query_id, r.vec_id) for r in got]
    assert len(pairs) == len(set(pairs)), pairs


def test_brute_force_arrow_honors_custom_id_columns(spark):
    """The Arrow top-k must name its output frame from id_col /
    query_id_col and type the schema from the inputs — string ids with
    non-default names used to fail (hardcoded 'query_id long,
    vec_id long')."""
    corpus = spark.createDataFrame(
        [("d1", [1.0, 0.0]), ("d2", [0.0, 1.0]), ("d3", [0.7, 0.7])],
        "doc_id string, embedding array<double>",
    )
    q = spark.createDataFrame(
        [("q1", [1.0, 0.0])], "qid string, query_vec array<double>"
    )
    got = SIM.brute_force_topk_arrow(
        corpus, q, k=2, id_col="doc_id", query_id_col="qid"
    ).collect()
    assert [r.doc_id for r in got] == ["d1", "d3"]
    assert got[0].qid == "q1" and got[0].rn == 1


def test_lsh_bucket_topk_empty_corpus_without_dim_raises_cleanly(spark):
    import pytest

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    q = spark.createDataFrame([(0, [1.0, 0.0])], "query_id long, query_vec array<double>")
    with pytest.raises(ValueError, match="dim"):
        SIM.lsh_bucket_topk(empty, q, k=2)


def test_fixture_embeddings_have_no_zero_norm(spark):
    """Un-thresholded cosine oracles rely on every fixture embedding
    having positive norm: Spark's cosine() maps a zero vector to 0.0
    while DuckDB's list_cosine_similarity returns -1.0, so a zero-norm
    row would rank differently per engine and fail the value hash. Pin
    the assumption so a regenerated corpus fails HERE with a clear
    message (see functions/vectors.py::cosine)."""
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        emb = load_table(spark, sf, "embeddings", columns=["embedding"])
        zero = emb.where(
            F.aggregate("embedding", F.lit(0.0), lambda a, x: a + x * x) <= 0.0
        ).count()
        assert zero == 0, sf


def test_pq_roundtrip_encode_decode_shapes(spark, sf_dir):
    """PQ fit/encode invariants: m codes per vector, every code a valid
    codebook index, and the joint fit returns m codebooks of ks
    sub-centroids of dimension d/m."""
    from mapreduce_system_spark.operators import pq as PQ

    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    m, ks = 8, 16
    books = PQ.pq_fit(emb, m=m, ks=ks, max_iter=3)
    assert len(books) == m
    assert all(len(b) == ks for b in books)
    assert all(len(c) == 64 // m for b in books for c in b)
    codes = PQ.pq_encode(emb, books)
    bad = codes.where(
        (F.size("codes") != m)
        | F.exists("codes", lambda c: (c < 0) | (c >= ks))
    ).count()
    assert bad == 0
    assert codes.count() == emb.count()


def test_pq_shortlist_rerank_recall_vs_brute_force(spark, sf_dir):
    """The registered PQ configuration (m=16, ks=16, ADC shortlist of 50,
    exact re-rank) must keep recall@5 high vs brute force — observed
    0.92 at sf0.001 and 0.96 at sf0.01; pinned with margin. Direct ADC
    top-5 (no re-rank) is also pinned, lower: the two-stage shape is
    the point of the operator."""
    from mapreduce_system_spark.operators import pq as PQ

    emb = load_table(spark, sf_dir, "embeddings", columns=["vec_id", "embedding"])
    q = _queries(emb, 10)
    books = PQ.pq_fit(emb, m=16, ks=16, max_iter=5)
    codes = PQ.pq_encode(emb, books)
    cb = spark.createDataFrame(
        [(j, c, books[j][c]) for j in range(16) for c in range(len(books[j]))],
        "subspace int, code int, centroid array<double>",
    )
    exact = {
        (r.query_id, r.vec_id) for r in SIM.brute_force_topk(emb, q, k=5).collect()
    }
    short = {
        (r.query_id, r.vec_id)
        for r in PQ.pq_topk_adc(codes, q, cb, k=50, score_round=6).collect()
    }
    recall_short = len(exact & short) / len(exact)
    assert recall_short >= 0.8, f"PQ shortlist recall {recall_short} collapsed"
    direct = {
        (r.query_id, r.vec_id)
        for r in PQ.pq_topk_adc(codes, q, cb, k=5).collect()
    }
    recall_direct = len(exact & direct) / len(exact)
    assert recall_direct >= 0.2, f"PQ direct-ADC recall {recall_direct} collapsed"


def test_cosine_null_vector_scores_null_not_zero(spark):
    """cosine(NULL, x) must be NULL (DuckDB's list_cosine_similarity
    convention) — the old 0.0 made a NULL embedding rankable (r10
    review). The zero-NORM convention stays 0.0."""
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, None, [1.0, 0.0]), (3, [0.0, 0.0], [1.0, 0.0])],
        "id long, a array<float>, b array<float>",
    )
    got = {r.id: r.c for r in df.select("id", cosine(F.col("a"), F.col("b")).alias("c")).collect()}
    assert got[1] == 1.0
    assert got[2] is None
    assert got[3] == 0.0


def test_cosine_dup_pairs_threshold_on_rounded_score(spark):
    """Pair membership thresholds compare round(cos, 6): a raw score of
    0.3999999 rounds across the 0.4 boundary and must be KEPT by both the
    JVM fold and the Arrow twin, while 0.39999 stays out — engine-side
    last-ulp summation drift can no longer decide boundary pairs."""
    import math

    near = 0.3999999   # rounds to 0.4 → in
    below = 0.39999    # rounds to 0.39999 → out
    rows = [
        (0, [1.0, 0.0], "x"),
        (1, [near, math.sqrt(1 - near * near)], "x"),
        (2, [-1.0, 0.0], "y"),
        (3, [below, -math.sqrt(1 - below * below)], "y"),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    for fn in (SIM.cosine_dup_pairs, SIM.cosine_dup_pairs_arrow):
        got = {(r.id_a, r.id_b) for r in fn(emb, threshold=0.4).collect()}
        assert got == {(0, 1)}, fn.__name__


def test_topk_ranks_on_rounded_score_with_id_tiebreak(spark):
    """Rank keys are round(cos, 6): two candidates whose raw cosines
    differ only past the 6th decimal are an exact tie, ordered by vec_id
    — so rank order can't depend on which engine's summation produced
    the last ulp."""
    import math

    hi, lo = 0.5000004, 0.5000001  # both round to 0.5
    corpus = spark.createDataFrame(
        [
            (3, [lo, math.sqrt(1 - lo * lo)]),   # lower raw cos, lower id
            (5, [hi, math.sqrt(1 - hi * hi)]),   # higher raw cos, higher id
            (9, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    q = spark.createDataFrame([(100, [1.0, 0.0])], "query_id long, query_vec array<double>")
    got = [r.vec_id for r in SIM.brute_force_topk(corpus, q, k=2).orderBy("rn").collect()]
    assert got == [3, 5]  # id tie-break wins over the sub-1e-6 raw edge
    got_arrow = [
        r.vec_id for r in SIM.brute_force_topk_arrow(corpus, q, k=2).orderBy("rn").collect()
    ]
    assert got_arrow == [3, 5]


def test_round_half_up_matches_jvm_and_duckdb_mode():
    """np.round is half-to-EVEN while F.round and DuckDB round() are half
    AWAY FROM ZERO: a score landing exactly on the 6-decimal boundary
    (2.5e-6) must round UP like the JVM/oracle paths, not down to the
    even neighbor (ADVICE r10). 1.5e-6 agrees under both modes — the
    control that the helper changes only the exact-half case."""
    import numpy as np

    a = np.array([2.5e-6, -2.5e-6, 1.5e-6, 0.3999999, 0.0])
    got = SIM.round_half_up(a)
    assert got.tolist() == [3e-6, -3e-6, 2e-6, 0.4, 0.0]
    # np.round would have produced the even neighbor on the exact halves
    assert np.round(a, 6).tolist()[:2] == [2e-6, -2e-6]


def test_round_half_up_matches_spark_on_shortest_repr_knife_edges():
    """The r11 review's verified divergence: 0.5000005 * 1e6 is
    500000.49999999994 in binary, so a plain scaled floor(+0.5) rounds
    DOWN while Spark (BigDecimal.valueOf on the shortest repr) rounds UP
    to 0.500001. The hybrid helper must take Spark's side — F.round is
    the final rank/threshold authority every Arrow call site must agree
    with. (DuckDB's round on a DOUBLE is scaled-binary and gives 0.5
    here — the engines themselves diverge on this measure-zero knife
    edge; that residual is documented at SCORE_DIGITS, and the helper
    deliberately mirrors Spark, not DuckDB.) 0.73500005 (binary lands
    above the grid point, repr keeps it below the half) is the control
    in the other direction."""
    import numpy as np

    vals = [0.5000005, -0.5000005, 0.73500005, 0.1234565, 0.2812505]
    got = SIM.round_half_up(np.array(vals)).tolist()
    assert got == [0.500001, -0.500001, 0.735, 0.123457, 0.281251]


def test_round_half_up_agrees_with_spark_f_round(spark):
    """Direct lockstep pin against the authority the call sites share:
    the per-batch Arrow prune key must equal the final window's
    F.round key on every knife-edge, or the prune can drop a row the
    final rank would have kept (r11 review failure scenario)."""
    import numpy as np

    vals = [0.5000005, 0.73500005, 0.1234565, 2.5e-6, 0.3999999, -0.2812505]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    jvm = [r.r for r in df.select(F.round("x", 6).alias("r")).collect()]
    assert SIM.round_half_up(np.array(vals)).tolist() == jvm


def test_cosine_dup_pairs_arrow_drops_null_embeddings_like_jvm_twin(spark):
    """One NULL embedding row must not crash the block task: the JVM twin
    excludes NULL-vector pairs via a NULL cosine failing the threshold,
    and the Arrow twin must stay bitwise-identical to it (r11 review —
    the remaining list(None) in the family)."""
    rows = [
        (0, [1.0, 0.0], "x"),
        (1, [0.9, 0.1], "x"),
        (2, None, "x"),
        (3, [0.8, 0.2], "y"),
        (4, None, "y"),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label string")
    jvm = sorted(map(tuple, SIM.cosine_dup_pairs(emb, threshold=0.4).collect()))
    arrow = sorted(map(tuple, SIM.cosine_dup_pairs_arrow(emb, threshold=0.4).collect()))
    assert arrow == jvm
    # blocking is per label: x pairs (0,1); y's only non-NULL row pairs
    # with nothing — the NULL rows vanish instead of crashing the stage
    assert {p[:2] for p in arrow} == {(0, 1)}


def test_random_projection_drops_null_embeddings(spark):
    """NULL vectors drop JVM-side instead of raising TypeError inside the
    Arrow stage (cosine()'s NULL convention; r11 review)."""
    rows = [(0, [1.0] * 4), (1, None), (2, [0.5] * 4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = SIM.random_projection(emb, in_dim=4, out_dim=2).collect()
    assert {r.vec_id for r in out} == {0, 2}


def test_pq_fit_and_encode_drop_null_embeddings(spark):
    """One NULL embedding row must not fail the Arrow stages: pq_fit and
    pq_encode drop NULL vectors at the scan (cosine()'s NULL convention,
    the brute_force_topk_arrow guard; ADVICE r10), and the fit matches
    the fit over the pre-filtered corpus exactly."""
    from pyspark.sql import Row

    from mapreduce_system_spark.operators import pq as PQ

    rows = [Row(vec_id=i, embedding=[float(i + j) for j in range(4)]) for i in range(8)]
    rows.append(Row(vec_id=99, embedding=None))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    clean = emb.where("embedding IS NOT NULL")
    books = PQ.pq_fit(emb, m=2, ks=2, max_iter=2)
    assert books == PQ.pq_fit(clean, m=2, ks=2, max_iter=2)
    codes = PQ.pq_encode(emb, books).collect()
    assert {r.vec_id for r in codes} == set(range(8))  # NULL row dropped
