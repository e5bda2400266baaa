"""Property-based checks (hypothesis) for the text/dedup invariants.

Each example builds a small DataFrame — examples are capped to keep the
Spark-job-per-example cost bounded.
"""

from __future__ import annotations

import os
import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from mapreduce_system_spark.functions import text as TXT
from mapreduce_system_spark.operators import dedup as DD

WORDS = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6), min_size=0, max_size=12
)

SETTINGS = settings(max_examples=8, deadline=None)

# Round-close mega-sweep knob: the cross-engine corpus families default to
# 5 examples (a Spark+DuckDB job pair per example keeps the suite's wall
# bounded), and SPARK_GRAFT_FUZZ_EXAMPLES=40 runs the same properties at
# sweep depth without editing the file — the discipline VERDICT r12 #8
# asks to be repeatable, not a one-off diff.
_SWEEP = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "0"))


def _family(default: int):
    return settings(max_examples=_SWEEP or default, deadline=None)

_spark = None


def _get_spark(spark):
    global _spark
    _spark = spark
    return spark


@given(words=WORDS, junk=st.sampled_from([" ", ",", "!!", " .. ", "\t"]))
@SETTINGS
def test_fingerprint_invariant_under_separators(spark, words, junk):
    """fingerprint depends only on the token stream, not separators/case."""
    s = _get_spark(spark)
    a = junk.join(words)
    b = " ".join(w.upper() for w in words)
    df = s.createDataFrame([Row(text=a), Row(text=b)])
    fps = [r.fp for r in df.select(TXT.fingerprint("text").alias("fp")).collect()]
    assert fps[0] == fps[1]


@given(words=WORDS)
@SETTINGS
def test_tokens_lowercase_nonempty(spark, words):
    s = _get_spark(spark)
    df = s.createDataFrame([Row(text="  ".join(words) + " !!")])
    toks = df.select(TXT.tokens("text").alias("t")).collect()[0].t
    assert all(t and t == t.lower() and not re.search(r"\W", t) for t in toks)
    assert toks == [w.lower() for w in words if w]


@given(words=st.lists(st.text(alphabet="abcd", min_size=1, max_size=3), min_size=3, max_size=10))
@SETTINGS
def test_jaccard_identical_docs_is_one(spark, words):
    """A doc duplicated verbatim must appear as a pair with jaccard 1.0."""
    s = _get_spark(spark)
    text = " ".join(words)
    df = s.createDataFrame([Row(doc_id=0, text=text), Row(doc_id=1, text=text)])
    pairs = {(r.id_a, r.id_b): r.jaccard for r in DD.jaccard_pairs(df, threshold=0.9).collect()}
    assert pairs == {(0, 1): 1.0}


@given(
    prefix=st.text(alphabet="abcdefgh ", min_size=0, max_size=20),
    shared=st.text(alphabet="mnopqrst ", min_size=TXT.WINNOW_K + TXT.WINNOW_W - 1,
                   max_size=24),
    suffix=st.text(alphabet="uvwxyz ", min_size=0, max_size=20),
)
@SETTINGS
def test_winnowing_guarantee_shared_substring_shares_fingerprint(
    spark, prefix, shared, suffix
):
    """The winnowing theorem (SIGMOD'03): two documents sharing a substring
    of length >= k+w-1 are guaranteed to share at least one fingerprint.
    The shared span is built from a disjoint alphabet so the overlap is
    exactly the implanted substring."""
    s = _get_spark(spark)
    df = s.createDataFrame(
        [Row(text=prefix + shared), Row(text=shared + suffix)]
    )
    fps = [
        set(r.f)
        for r in df.select(TXT.winnow_fingerprints("text").alias("f")).collect()
    ]
    assert fps[0] & fps[1], (prefix, shared, suffix)


@given(
    w=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=6),
    color_type=st.sampled_from([0, 2, 6]),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_png_decode_roundtrip_any_image_any_filters(w, h, color_type, data):
    """decode_image_png must reconstruct ANY 8-bit image exactly under
    ANY per-row filter schedule: (width, height) match and the luma mean
    equals the reference computation on the raw pixels (no Spark session
    needed — the codec is a pure function, which is the point of the
    adapter seam)."""
    from mapreduce_system_spark.operators.multimodal import decode_image_png
    from tests.test_multimodal import _encode_png, _luma_mean

    channels = {0: 1, 2: 3, 6: 4}[color_type]
    rows = [
        bytes(data.draw(st.lists(st.integers(0, 255), min_size=w * channels, max_size=w * channels)))
        for _ in range(h)
    ]
    filters = data.draw(st.lists(st.integers(0, 4), min_size=h, max_size=h))
    got = decode_image_png(_encode_png(w, h, rows, color_type=color_type, filters=filters))
    assert got is not None
    gw, gh, mean, name = got
    assert (gw, gh, name) == (w, h, "png")
    assert mean == _luma_mean(rows, channels)


@given(
    w=st.integers(min_value=1, max_value=20),
    h=st.integers(min_value=1, max_value=20),
    sub=st.sampled_from([(1, 1), (2, 1), (1, 2), (2, 2)]),
    data=st.data(),
)
@settings(max_examples=25, deadline=None)
def test_jpeg_rgb_roundtrip_pixel_exact_any_shape(w, h, sub, data):
    """For ANY image size and subsampling mode, decoding an
    encode_image_jpeg_baseline stream must reproduce the independently
    computed numpy reconstruction pixel-for-pixel (the hand-picked
    shapes of tests/test_multimodal.py, generalized: padding, MCU
    alignment, edge replication and upsample/crop all vary here)."""
    import numpy as np

    from mapreduce_system_spark.operators.multimodal import (
        decode_image_jpeg_rgb,
        encode_image_jpeg_baseline,
    )
    from tests.test_multimodal import _expected_jpeg_rgb

    flat = data.draw(
        st.lists(st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3)
    )
    rgb = np.asarray(flat, dtype=np.uint8).reshape(h, w, 3)
    got = decode_image_jpeg_rgb(encode_image_jpeg_baseline(rgb, subsampling=sub))
    want_rgb, _want_y = _expected_jpeg_rgb(rgb, sub)
    assert got is not None and (got[0], got[1]) == (w, h)
    assert (got[2] == want_rgb).all()


@given(
    m=st.sampled_from([2, 4, 8]),
    n_extra=st.integers(min_value=0, max_value=6),
    data=st.data(),
)
@settings(max_examples=10, deadline=None)
def test_pq_adc_exact_when_corpus_is_codebook_pure(spark, m, n_extra, data):
    """ADC invariant: when every corpus vector is EXACTLY a combination
    of sub-codebook centroids (reconstruction error zero), the ADC score
    equals true cosine, so PQ top-k == brute-force top-k. Build ks=2
    centroids per subspace from two base vectors, generate corpus rows
    as arbitrary per-subspace selections, and compare against the exact
    ranking."""
    import numpy as np

    from mapreduce_system_spark.operators import pq as PQ
    from mapreduce_system_spark.operators import similarity as SIM

    d = 8
    sub = d // m
    rng_a = np.arange(1, d + 1, dtype=np.float64)
    rng_b = rng_a[::-1] * 1.5
    books = [
        [rng_a[j * sub : (j + 1) * sub].tolist(), rng_b[j * sub : (j + 1) * sub].tolist()]
        for j in range(m)
    ]
    picks = [
        data.draw(st.lists(st.integers(0, 1), min_size=m, max_size=m))
        for _ in range(4 + n_extra)
    ]
    vecs = [
        [x for j, p in enumerate(pick) for x in books[j][p]] for pick in picks
    ]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    q = emb.where("vec_id = 0").selectExpr(
        "vec_id as query_id", "embedding as query_vec"
    )
    codes = PQ.pq_encode(emb, books)
    cb = spark.createDataFrame(
        [(j, c, books[j][c]) for j in range(m) for c in range(2)],
        "subspace int, code int, centroid array<double>",
    )
    k = min(3, len(vecs) - 1)
    adc = [
        (r.query_id, r.vec_id)
        for r in PQ.pq_topk_adc(codes, q, cb, k=k, score_round=6)
        .orderBy("rn")
        .collect()
    ]
    exact = [
        (r.query_id, r.vec_id)
        for r in SIM.brute_force_topk(emb, q, k=k).orderBy("rn").collect()
    ]
    # scores can tie (duplicate vectors are legal draws); compare the
    # score MULTISETS via re-derived exact cosine of each picked id
    def cos(i):
        a = np.asarray(vecs[0])
        b = np.asarray(vecs[i])
        return round(float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b))), 6)

    assert [cos(i) for _, i in adc] == [cos(i) for _, i in exact]


@given(perm=st.permutations([1e16, -1e16, 1.0, -1.0]))
@settings(max_examples=8, deadline=None)
def test_weighted_mean_cancellation_is_order_independent(spark, perm):
    """fsum makes the zero-weight NULL gate independent of row order:
    every permutation of exactly-canceling weights must yield NULL, not
    an absorption-artifact mean (r10 review)."""
    from mapreduce_system_spark.functions.udafs import weighted_mean

    rows = [(1, float(i), float(w)) for i, w in enumerate(perm)]
    df = spark.createDataFrame(rows, "g long, v double, w double")
    wm = weighted_mean()
    out = df.groupBy("g").agg(wm("v", "w").alias("m")).collect()
    assert out[0]["m"] is None


# ---------------------------------------------------------------------------
# cross-engine fuzz (r11): hypothesis-generated events corpora vs the
# registered oracles — the adversarial gate generalized from one crafted
# corpus to shrinkable random ones. Queries chosen for tie/NULL-heavy
# semantics (argmax ties, struct min/max, grouped sums over NULL keys).
# ---------------------------------------------------------------------------

import datetime as _dt

import duckdb as _duckdb

_FUZZ_QUERIES = (
    "rel_cdc_latest_state",
    "fn_ohlc_hourly",
    "stream_user_totals_batch",
    "agg_grouped_mode_argmax",
    "pipe_keep_latest_k",
)

_TS_DOMAIN = [
    _dt.datetime(2024, 1, 1, 0, 0, 0),
    _dt.datetime(2024, 1, 1, 0, 0, 0),   # deliberate tie weight
    _dt.datetime(2024, 1, 1, 0, 30, 0),
    _dt.datetime(2024, 1, 1, 1, 0, 0),
    _dt.datetime(2024, 1, 3, 23, 59, 59),
    _dt.datetime(2024, 2, 1, 12, 0, 0),
]

_EVENT_ROW = st.tuples(
    st.sampled_from(_TS_DOMAIN),
    st.sampled_from([None, 1, 2, 3]),                       # user_id
    st.sampled_from([None, "open", "view", "pay"]),          # event_type
    st.sampled_from([None, 0.0, -1.5, 2.25, 100.5, 1e12]),   # value
    st.sampled_from([None, "{}", '{"k": 1}', "not json"]),   # props
)


@given(rows=st.lists(_EVENT_ROW, min_size=0, max_size=12))
@_family(5)
def test_event_queries_match_oracle_on_random_corpora(spark, rows):
    """Spark result == DuckDB oracle on ARBITRARY small events tables
    (NULL keys/types/values, timestamp ties, malformed JSON, empty
    corpus). event_id is the enumeration index, so every tie-break the
    queries rely on stays unique — exactly the fixture contract."""
    import tempfile

    import mapreduce_system_spark.queries  # noqa: F401
    from mapreduce_system_spark.registry import ORACLE_SQL, QUERIES

    s = _get_spark(spark)
    d = tempfile.mkdtemp(prefix="fuzz_events_")
    data = [
        Row(event_id=i, ts=ts, user_id=u, event_type=et, value=v, props=p)
        for i, (ts, u, et, v, p) in enumerate(rows, start=1)
    ]
    s.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{d}/events.parquet/*.parquet')"
    )
    for name in _FUZZ_QUERIES:
        got = sorted(repr(tuple(r)) for r in QUERIES[name](s, d).collect())
        want = sorted(repr(tuple(r)) for r in con.execute(ORACLE_SQL[name]).fetchall())
        assert got == want, (name, rows, got[:4], want[:4])


_LI_ROW = st.tuples(
    st.sampled_from([None, "A", "N", "R"]),                      # l_returnflag
    st.sampled_from([None, 0.0, 1.0, 2.5, 2.5, 99.75, 1e9]),     # l_extendedprice
    st.sampled_from([None, 1.0, 3.0, 50.0]),                     # l_quantity
)

_LI_FUZZ_QUERIES = (
    "agg_quantiles",
    "agg_mad_outliers",
    "agg_approx_quantiles",
    "agg_moments_profile",
)


@given(rows=st.lists(_LI_ROW, min_size=0, max_size=14))
@_family(5)
def test_rank_family_matches_oracle_on_random_corpora(spark, rows):
    """The rank-selection / robust-stats family on ARBITRARY lineitem
    corpora: NULL group keys, NULL measures, all-NULL groups, duplicate
    values on rank boundaries, extreme magnitudes, empty corpus — the
    exact classes behind this round's eqNullSafe and all-NULL-group
    fixes, re-proved continuously instead of on one crafted corpus."""
    import tempfile

    import mapreduce_system_spark.queries  # noqa: F401
    from mapreduce_system_spark.registry import ORACLE_SQL, QUERIES

    s = _get_spark(spark)
    d = tempfile.mkdtemp(prefix="fuzz_li_")
    data = [
        Row(
            l_orderkey=i, l_partkey=i % 5, l_suppkey=i % 3, l_linenumber=1,
            l_quantity=q, l_extendedprice=px, l_discount=0.05, l_tax=0.02,
            l_returnflag=fl, l_linestatus="F",
            l_shipdate=_dt.datetime(2024, 3, 1 + (i % 20)),
        )
        for i, (fl, px, q) in enumerate(rows, start=1)
    ]
    s.createDataFrame(
        data,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM "
        f"read_parquet('{d}/lineitem.parquet/*.parquet')"
    )
    for name in _LI_FUZZ_QUERIES:
        got = sorted(repr(tuple(r)) for r in QUERIES[name](s, d).collect())
        want = sorted(repr(tuple(r)) for r in con.execute(ORACLE_SQL[name]).fetchall())
        assert got == want, (name, rows, got[:4], want[:4])


# risky codepoints: sharp s, final sigma, capital sigma, combining
# accent, ZWJ, NBSP, vertical tab, CJK, emoji -- the casefold/regex
# classes where JVM and DuckDB unicode handling could silently diverge.
# U+0130 (Turkish dotted I) is EXCLUDED BY MEASURED CONTRACT, not
# oversight: it is Unicode's only non-conditional length-changing
# lowercase mapping and the ENGINES themselves disagree on it (Spark's
# JVM lower gives 'i'+U+0307, DuckDB's simple folding gives 'i') --
# test_dotted_capital_i_is_the_documented_lower_divergence pins the
# behavior, and the fixture guard pins its absence from the verified
# corpora (the zero-norm-cosine precedent).
_RISKY = "\u00df\u03c2\u03a3e\u0301\u200d\u00a0\x0b\u4e2d\U0001f600"
_TEXT_ALPHABET = "abc ABC 012_-.!" + _RISKY

_DOC_FUZZ_QUERIES = (
    "dedup_exact",
    "txt_token_stats",
    "txt_ttr_lexical_diversity",
    "pipe_clean_corpus",
)


@given(
    texts=st.lists(
        st.one_of(st.none(), st.text(alphabet=_TEXT_ALPHABET, max_size=40)),
        min_size=0,
        max_size=10,
    )
)
@_family(5)
def test_text_queries_match_oracle_on_random_unicode_corpora(spark, texts):
    """Random unicode documents (locale-sensitive casefold codepoints,
    combining accents, ZWJ/NBSP, CJK, emoji, NULL/empty texts) must
    hash-match the registered oracles for the tokenize/fingerprint
    family — the Java-vs-RE2/ICU class, fuzzed instead of enumerated."""
    import tempfile

    import mapreduce_system_spark.queries  # noqa: F401
    from mapreduce_system_spark.registry import ORACLE_SQL, QUERIES

    s = _get_spark(spark)
    d = tempfile.mkdtemp(prefix="fuzz_docs_")
    data = [
        Row(
            doc_id=i,
            text=t,
            lang=("en" if i % 2 else "de"),
            source=f"src{i % 3}",
            n_chars=(len(t) if t is not None else 0),
        )
        for i, t in enumerate(texts)
    ]
    s.createDataFrame(
        data, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    for name in _DOC_FUZZ_QUERIES:
        got = sorted(repr(tuple(r)) for r in QUERIES[name](s, d).collect())
        want = sorted(repr(tuple(r)) for r in con.execute(ORACLE_SQL[name]).fetchall())
        assert got == want, (name, texts, got[:4], want[:4])


def test_dotted_capital_i_is_the_documented_lower_divergence(spark):
    """U+0130 is the one codepoint where the ENGINES' lower() disagree
    (found by this fuzz at 30 examples): Spark's JVM lower applies the
    full Unicode mapping ('i' + combining dot U+0307, 2 codepoints),
    DuckDB's simple folding gives plain 'i' — so any tokenizing or
    fingerprinting oracle diverges on text containing it. Measured and
    pinned HERE as a domain contract (the fixtures are guarded free of
    it below); if either engine changes behavior, this test says so."""
    from pyspark.sql import functions as F

    s = _get_spark(spark)
    jvm = s.createDataFrame([("İ",)], "x string").select(
        F.lower("x").alias("l")
    ).collect()[0].l
    assert jvm == "i̇"  # full mapping: length 2
    ddb = _duckdb.sql("SELECT lower('İ')").fetchone()[0]
    assert ddb == "i"  # simple folding: length 1
    assert jvm != ddb  # the divergence this contract documents


def test_fixture_documents_have_no_dotted_capital_i(spark):
    """The text-oracle verified domain excludes U+0130 (see the measured
    contract above) — pin that the fixture corpora stay inside it, so a
    regenerated corpus fails HERE with a clear message instead of as an
    opaque hash mismatch in any lowercasing query."""
    from pyspark.sql import functions as F

    from mapreduce_system_spark.sources.tables import load_table

    s = _get_spark(spark)
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = load_table(s, sf, "documents", columns=["text"])
        n = docs.where(F.col("text").contains("İ")).count()
        assert n == 0, sf


# components on a power-of-two grid: every dot product / norm argument is
# EXACT in double regardless of summation order, so a cross-engine
# mismatch here is a semantic divergence, never float noise.
#
# HALF-POINT CONSTRAINT for any future score-bearing corpus (ADVICE r11):
# Spark's F.round(double) half-ups on the SHORTEST DECIMAL REPR while
# DuckDB's round(DOUBLE) is scaled-binary, so a score landing EXACTLY on
# a decimal half-point at the rounding digit (e.g. 0.5000005 at 6) is the
# documented measure-zero residual where the engines legitimately differ
# (similarity.SCORE_DIGITS). Keep fuzz/adversarial values off such grid
# half-points — dyadic component grids like this one are safe because
# cosine scores pass through sqrt and cannot be decimal half-points —
# rather than "fixing" a failure that is the contract working as
# documented.
_VEC_COMPONENT = st.sampled_from([-2.0, -1.0, -0.5, 0.0, 0.25, 0.5, 1.0, 2.0])
_EMB_VECTOR = st.one_of(
    st.none(), st.lists(_VEC_COMPONENT, min_size=8, max_size=8)
)

_EMB_FUZZ_QUERIES = (
    "emb_int8_quantize_error",
    "emb_centroid_outliers",
    "emb_hof_vector_stats",
    "emb_centroid_distance_matrix",
    "emb_pca_power_iteration",
    "emb_pca_topk_deflation",
)


@given(vecs=st.lists(_EMB_VECTOR, min_size=0, max_size=10))
@_family(5)
def test_embedding_queries_match_oracle_on_random_corpora(spark, vecs):
    """Random d=8 embedding corpora (zero vectors, NULL embeddings,
    antipodal/duplicate rows, mixed magnitudes — all on the exact grid)
    must hash-match the registered oracles for the embedding-statistics
    and PCA family."""
    import tempfile

    import mapreduce_system_spark.queries  # noqa: F401
    from mapreduce_system_spark.registry import ORACLE_SQL, QUERIES

    s = _get_spark(spark)
    d = tempfile.mkdtemp(prefix="fuzz_emb_")
    data = [
        Row(vec_id=i, embedding=v, label=i % 3)
        for i, v in enumerate(vecs)
    ]
    s.createDataFrame(
        data, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(f"{d}/embeddings.parquet")
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    no_vectors = not any(v is not None for v in vecs)
    for name in _EMB_FUZZ_QUERIES:
        if name == "emb_pca_topk_deflation" and no_vectors:
            # pca_topk's documented contract: a corpus with no vector
            # components raises loudly instead of emitting directions
            # (operators/pca.py) — pin the contract, skip the compare
            with pytest.raises(Exception, match="no vector components"):
                QUERIES[name](s, d).collect()
            continue
        got = sorted(repr(tuple(r)) for r in QUERIES[name](s, d).collect())
        want = sorted(repr(tuple(r)) for r in con.execute(ORACLE_SQL[name]).fetchall())
        assert got == want, (name, vecs, got[:4], want[:4])


_ORDER_ROW = st.tuples(
    st.sampled_from([None, 1, 2, 3, 4]),                      # o_custkey
    st.sampled_from([None, 900.0, 1000.25, 1000.25, 5000.5]), # o_totalprice (tie weight)
    st.sampled_from([None, _dt.datetime(2024, 1, 5),
                     _dt.datetime(2024, 1, 5),                # date tie weight
                     _dt.datetime(2024, 2, 10),
                     _dt.datetime(2024, 3, 1)]),              # o_orderdate
    st.sampled_from(["1-URGENT", "2-HIGH"]),                  # o_orderpriority
)

_ORD_FUZZ_QUERIES = (
    "rel_topk_per_group",
    "rel_running_agg",
    "rel_window_lag_rank",
    "rel_window_cume_ntile",
    "rel_histogram_equi_depth",
    "fn_date_trunc_monthly",
)


_CUST_ROW = st.tuples(
    st.sampled_from([0, 1, 2]),                                # c_nationkey
    st.sampled_from([None, -50.0, 0.0, 100.25, 100.25, 900.0]),  # c_acctbal (ties)
    st.sampled_from(["AUTOMOBILE", "BUILDING"]),               # c_mktsegment
)


@given(
    rows=st.lists(_ORDER_ROW, min_size=0, max_size=12),
    cust=st.lists(_CUST_ROW, min_size=0, max_size=8),
)
@_family(5)
def test_window_rank_queries_match_oracle_on_random_corpora(spark, rows, cust):
    """The window/rank family on ARBITRARY orders/customer corpora: NULL
    keys, NULL order dates riding ascending windows (the asc_nulls_last
    pin class), NULL measures on rank boundaries, duplicate
    dates/prices/balances on tie-breaks, empty corpus. The enumeration
    index keys keep every deterministic tie-break unique."""
    import tempfile

    import mapreduce_system_spark.queries  # noqa: F401
    from mapreduce_system_spark.registry import ORACLE_SQL, QUERIES

    s = _get_spark(spark)
    d = tempfile.mkdtemp(prefix="fuzz_ord_")
    data = [
        Row(o_orderkey=i, o_custkey=c, o_orderstatus="O",
            o_totalprice=p, o_orderdate=dt_, o_orderpriority=pr)
        for i, (c, p, dt_, pr) in enumerate(rows, start=1)
    ]
    s.createDataFrame(
        data,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    cdata = [
        Row(c_custkey=i, c_name=f"c{i}", c_nationkey=nk, c_acctbal=ab,
            c_mktsegment=seg)
        for i, (nk, ab, seg) in enumerate(cust, start=1)
    ]
    s.createDataFrame(
        cdata,
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    con = _duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    for name in _ORD_FUZZ_QUERIES:
        got = sorted(repr(tuple(r)) for r in QUERIES[name](s, d).collect())
        want = sorted(repr(tuple(r)) for r in con.execute(ORACLE_SQL[name]).fetchall())
        assert got == want, (name, rows, got[:4], want[:4])


_ASOF_EVENT = st.tuples(
    st.sampled_from([_dt.datetime(2024, 1, 1, h, m)
                     for h, m in [(0, 0), (0, 0), (6, 30), (12, 0), (23, 59)]]),
    st.sampled_from([None, 10, 11, 12]),
)
_ASOF_ORDER = st.tuples(
    st.sampled_from([None, 10, 11, 12, 13]),
    st.sampled_from([None,
                     _dt.datetime(2024, 1, 1, 0, 0),
                     _dt.datetime(2024, 1, 1, 0, 0),
                     _dt.datetime(2024, 1, 1, 6, 30),
                     _dt.datetime(2024, 1, 2, 0, 0)]),
    st.sampled_from([None, 100.0, 250.5]),
)

_ASOF_FUZZ_QUERIES = (
    "asof_join_events_orders",
    "asof_join_salted_events",
    "asof_join_nearest",
)


@given(
    evs=st.lists(_ASOF_EVENT, min_size=0, max_size=10),
    ords=st.lists(_ASOF_ORDER, min_size=0, max_size=10),
)
@_family(5)
def test_asof_queries_match_native_asof_on_random_corpora(spark, evs, ords):
    """The as-of family vs DuckDB's NATIVE ASOF JOIN on arbitrary
    events×orders corpora — two genuinely independent implementations
    (union+window vs DuckDB's dedicated operator) agreeing on random
    NULL keys, NULL/duplicate timestamps on the boundary, equal-time
    matches, and users with no history. The salted rewrite rides the
    same oracle, so its semantic invisibility is fuzzed too."""
    import tempfile

    import mapreduce_system_spark.queries  # noqa: F401
    from mapreduce_system_spark.registry import ORACLE_SQL, QUERIES

    s = _get_spark(spark)
    d = tempfile.mkdtemp(prefix="fuzz_asof_")
    edata = [
        Row(event_id=i, ts=ts, user_id=u, event_type="open",
            value=1.0, props=None)
        for i, (ts, u) in enumerate(evs, start=1)
    ]
    s.createDataFrame(
        edata,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.mode("overwrite").parquet(f"{d}/events.parquet")
    odata = [
        Row(o_orderkey=i, o_custkey=c, o_orderstatus="O",
            o_totalprice=p, o_orderdate=dt_, o_orderpriority="1-URGENT")
        for i, (c, dt_, p) in enumerate(ords, start=1)
    ]
    s.createDataFrame(
        odata,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    con = _duckdb.connect()
    for t in ("events", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    for name in _ASOF_FUZZ_QUERIES:
        got = sorted(repr(tuple(r)) for r in QUERIES[name](s, d).collect())
        want = sorted(repr(tuple(r)) for r in con.execute(ORACLE_SQL[name]).fetchall())
        assert got == want, (name, evs, ords, got[:4], want[:4])


# ---------------------------------------------------------------------------
# cross-engine fuzz, seventh family (r12): ITERATIVE GRAPH queries on
# random topologies — PageRank x4 (plain / dangling-redistribute /
# weighted / seeded-personalized), multi-source BFS, triangles, degree
# census. The one oracle class the first six families never fuzzed: the
# unrolled-CTE / WITH RECURSIVE oracles were only ever exercised on the
# fixture's purchase graph and one crafted corpus, while their edge
# cases are TOPOLOGICAL (self-contained cycles, all-dangling graphs,
# NULL-key nodes, disconnected components, empty seed cohorts).
# ---------------------------------------------------------------------------

_GRAPH_FUZZ_QUERIES = (
    "graph_pagerank",
    "graph_pagerank_dangling",
    "graph_pagerank_weighted",
    "graph_pagerank_personalized",
    "graph_bfs_reachability",
    "graph_triangle_count",
    "graph_degree_distribution",
)

# small key domains force collision-rich topologies: shared suppliers,
# repeated parts (triangles), dangling orders (l_orderkey 5/6 may have no
# order row), NULL custkeys (NULL-labeled nodes: dangling on both engines,
# never equi-joined), NULL suppkeys, NULL quantities (filtered by the
# weighted edge predicate on both engines)
_GRAPH_ORDER = st.sampled_from([None, 1, 2, 3])                 # o_custkey
_GRAPH_LI_ROW = st.tuples(
    st.sampled_from([1, 2, 3, 4, 5, 6]),                        # l_orderkey
    st.sampled_from([None, 1, 2]),                              # l_suppkey
    st.sampled_from([1, 2, 3, 4]),                              # l_partkey
    st.sampled_from([None, 1.0, 3.0]),                          # l_quantity
)
_GRAPH_CUST = st.sampled_from(["AUTOMOBILE", "BUILDING"])       # c_mktsegment
_GRAPH_SUPP = st.sampled_from([0, 1])                           # s_nationkey


@given(
    ocust=st.lists(_GRAPH_ORDER, min_size=0, max_size=5),
    li=st.lists(_GRAPH_LI_ROW, min_size=0, max_size=10),
    segs=st.lists(_GRAPH_CUST, min_size=0, max_size=3),
    snat=st.lists(_GRAPH_SUPP, min_size=2, max_size=2),
)
@_family(5)
def test_graph_queries_match_oracle_on_random_graphs(spark, ocust, li, segs, snat):
    """Spark's iterative loops (localCheckpoint rank vectors, frontier
    BFS, oriented triangle join) == DuckDB's unrolled-CTE / WITH
    RECURSIVE oracles on ARBITRARY small purchase graphs. The seeded
    query's documented contract — an empty effective seed cohort raises
    instead of dividing by zero — is pinned on exactly the corpora that
    produce it."""
    import tempfile

    import mapreduce_system_spark.queries  # noqa: F401
    from mapreduce_system_spark.registry import ORACLE_SQL, QUERIES

    s = _get_spark(spark)
    d = tempfile.mkdtemp(prefix="fuzz_graph_")
    s.createDataFrame(
        [Row(o_orderkey=i, o_custkey=c) for i, c in enumerate(ocust, start=1)],
        "o_orderkey long, o_custkey long",
    ).write.mode("overwrite").parquet(f"{d}/orders.parquet")
    s.createDataFrame(
        [
            Row(l_orderkey=ok, l_suppkey=sk, l_partkey=pk, l_quantity=q)
            for ok, sk, pk, q in li
        ],
        "l_orderkey long, l_suppkey long, l_partkey long, l_quantity double",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    s.createDataFrame(
        [Row(c_custkey=i, c_mktsegment=seg) for i, seg in enumerate(segs, start=1)],
        "c_custkey long, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    s.createDataFrame(
        [Row(s_suppkey=i, s_nationkey=nk) for i, nk in enumerate(snat, start=1)],
        "s_suppkey long, s_nationkey int",
    ).write.mode("overwrite").parquet(f"{d}/supplier.parquet")
    s.createDataFrame(
        [Row(n_nationkey=0, n_name="NATION_0"), Row(n_nationkey=1, n_name="NATION_1")],
        "n_nationkey int, n_name string",
    ).write.mode("overwrite").parquet(f"{d}/nation.parquet")

    con = _duckdb.connect()
    for t in ("orders", "lineitem", "customer", "supplier", "nation"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet/*.parquet')"
        )

    # effective personalized seeds = BUILDING customers whose custkey is a
    # graph node (has >= 1 order matched by >= 1 lineitem row) — computed
    # from the generated rows so the raise-contract is asserted on exactly
    # the corpora that trigger it
    orderkeys_with_li = {ok for ok, _, _, _ in li}
    cust_nodes = {
        c
        for i, c in enumerate(ocust, start=1)
        if c is not None and i in orderkeys_with_li
    }
    building = {i for i, seg in enumerate(segs, start=1) if seg == "BUILDING"}
    has_seeds = bool(cust_nodes & building)
    # an EMPTY graph short-circuits to an empty result before seed
    # validation (operators/graph.py n == 0 return) — the raise contract
    # applies only to a non-empty graph with no effective seed
    has_edges = any(ok <= len(ocust) for ok, _, _, _ in li)

    for name in _GRAPH_FUZZ_QUERIES:
        if name == "graph_pagerank_personalized" and has_edges and not has_seeds:
            with pytest.raises(Exception, match="no seed id"):
                QUERIES[name](s, d).collect()
            continue
        got = sorted(repr(tuple(r)) for r in QUERIES[name](s, d).collect())
        want = sorted(repr(tuple(r)) for r in con.execute(ORACLE_SQL[name]).fetchall())
        assert got == want, (name, ocust, li, segs, snat, got[:4], want[:4])


@given(
    edges=st.lists(
        st.tuples(
            st.sampled_from([1, 2, 3, 4, 5, 6]), st.sampled_from([1, 2, 3, 4, 5, 6])
        ),
        min_size=0,
        max_size=10,
    )
)
@_family(5)
def test_connected_components_match_recursive_closure_on_random_graphs(spark, edges):
    """operators/dedup.py::connected_components (iterative min-label
    propagation) == DuckDB's WITH RECURSIVE reachability closure on
    ARBITRARY pair graphs — the survivorship oracle fuzzed on random
    topologies (long chains at the convergence bound, cycles, self-loops,
    disconnected singletons) instead of the registered query's shallow
    shingle clusters. Survivor = min id reachable through the UNDIRECTED
    closure on both engines."""
    from mapreduce_system_spark.operators.dedup import connected_components

    s = _get_spark(spark)
    pairs = [(min(a, b), max(a, b)) for a, b in edges]
    df = s.createDataFrame(
        [Row(id_a=a, id_b=b) for a, b in pairs] or [], "id_a long, id_b long"
    )
    got = sorted(
        (r.id, r.survivor_id)
        for r in connected_components(df, max_iter=30).collect()
    )
    if not pairs:
        assert got == []
        return
    con = _duckdb.connect()
    vals = ", ".join(f"({a}, {b})" for a, b in pairs)
    want = sorted(
        con.execute(
            f"""
WITH RECURSIVE p(a, b) AS (SELECT * FROM (VALUES {vals}) v(a, b)),
e AS (SELECT a, b FROM p UNION SELECT b, a FROM p),
reach AS (
  SELECT a AS id, a AS r FROM e
  UNION
  SELECT reach.id, e.b AS r FROM reach JOIN e ON e.a = reach.r
)
SELECT id, min(r) AS survivor_id FROM reach GROUP BY id
"""
        ).fetchall()
    )
    assert got == want, (pairs, got[:6], want[:6])


# ---------------------------------------------------------------------------
# cross-engine fuzz, eighth family (r12): TEXT-SINK roundtrips on random
# string corpora. The r12 probe showed Spark's DEFAULT csv options
# silently corrupt four value classes (embedded newlines/CRs split
# records, the WRITER strips padded whitespace, '' reads back as NULL) —
# the seam now pins faithful options (sources/text.py::read_csv), and
# this family holds the line: random customer corpora whose group key
# carries exactly those classes must aggregate identically through
# Spark's csv+json (and orc) write→scan→agg and DuckDB's direct read of
# the source parquet. The literal string '\\N' is the documented in-band
# sentinel residual and stays out of the alphabet (the U+0130 pattern:
# a measured contract, not an oversight).
# ---------------------------------------------------------------------------

_SEG_DOMAIN = [
    None, "", "plain", 'has"quote', "has,comma", "has\nnewline",
    "has\rret", "has\\backslash", "café 中文 \U0001f600", "tab\there",
    " padded ", '""', "=formula", "BUILDING",
]

_SINK_FUZZ_QUERIES = ("scan_csv_json_roundtrip", "scan_orc_roundtrip")

_CUST_FUZZ_ROW = st.tuples(
    st.sampled_from(_SEG_DOMAIN),                       # c_mktsegment
    st.sampled_from([0, 1, 2]),                         # c_nationkey
    st.sampled_from([None, -50.0, 0.0, 100.25, 1e12]),  # c_acctbal
)


@given(rows=st.lists(_CUST_FUZZ_ROW, min_size=0, max_size=12))
@_family(5)
def test_sink_roundtrip_queries_match_oracle_on_random_corpora(spark, rows):
    import glob
    import shutil
    import tempfile
    from pathlib import Path

    import mapreduce_system_spark.queries  # noqa: F401
    from mapreduce_system_spark.registry import ORACLE_SQL, QUERIES

    s = _get_spark(spark)
    d = tempfile.mkdtemp(prefix="fuzz_sink_")
    data = [
        Row(c_custkey=i, c_nationkey=nk, c_acctbal=bal, c_mktsegment=seg)
        for i, (seg, nk, bal) in enumerate(rows, start=1)
    ]
    s.createDataFrame(
        data,
        "c_custkey long, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(f"{d}/customer.parquet")
    con = _duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        f"read_parquet('{d}/customer.parquet/*.parquet')"
    )
    try:
        for name in _SINK_FUZZ_QUERIES:
            got = sorted(repr(tuple(r)) for r in QUERIES[name](s, d).collect())
            want = sorted(
                repr(tuple(r)) for r in con.execute(ORACLE_SQL[name]).fetchall()
            )
            assert got == want, (name, rows, got[:4], want[:4])
    finally:
        # the queries stage through /tmp/spark_graft_{scan,orc}_<sf-dir
        # basename>_<app> — the basename here is a unique mkdtemp name
        # that no LATER run's 48h reap prefix can ever match (unlike the
        # fixture/gate basenames, which repeat), so remove them here
        # along with the corpus (r12 review)
        base = Path(d).name
        for p in glob.glob(f"/tmp/spark_graft_*_{base}_*"):
            shutil.rmtree(p, ignore_errors=True)
        shutil.rmtree(d, ignore_errors=True)
