"""Top-k PCA via power iteration + deflation (operators/pca.py)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import Row

from mapreduce_system_spark.operators.pca import pca_topk

# deterministic 8x4 matrix with a well-separated singular spectrum so a
# dozen power rounds converge far past the assertion tolerance
_X = np.array(
    [
        [9.0, 1.0, 0.5, 0.1],
        [8.5, 1.2, 0.4, 0.2],
        [9.2, 0.8, 0.6, 0.1],
        [0.5, 6.0, 2.0, 0.3],
        [0.4, 6.2, 1.8, 0.2],
        [0.6, 5.8, 2.2, 0.4],
        [0.1, 0.2, 0.1, 3.0],
        [0.2, 0.1, 0.2, 3.1],
    ]
)


def _corpus(spark):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in row]) for i, row in enumerate(_X)],
        "vec_id long, embedding array<float>",
    )


def _loadings(spark, k, rounds):
    out = pca_topk(_corpus(spark), k=k, rounds=rounds).collect()
    comps = {}
    for r in out:
        comps.setdefault(r.component, {})[r.pos] = r.loading
    d = _X.shape[1]
    return [np.array([comps[c][p] for p in range(d)]) for c in sorted(comps)]


def test_pca_topk_matches_numpy_singular_vectors_up_to_sign(spark):
    vs = _loadings(spark, k=3, rounds=12)
    _, _, vt = np.linalg.svd(_X, full_matrices=False)
    for c in range(3):
        align = abs(float(np.dot(vs[c], vt[c])))
        assert align > 1 - 1e-8, (c, align, vs[c], vt[c])


def test_pca_topk_directions_are_orthonormal(spark):
    vs = _loadings(spark, k=3, rounds=12)
    for i in range(3):
        assert abs(float(np.linalg.norm(vs[i])) - 1.0) < 1e-9
        for j in range(i):
            assert abs(float(np.dot(vs[i], vs[j]))) < 1e-9


def test_pca_topk_k1_matches_single_direction_query_convention(spark):
    """k=1 is exactly the fresh8m power iteration (uniform unit start,
    two aggregates per round) — the leading direction of the 8x4 fixture
    must match numpy's to tight tolerance with the same round count."""
    vs = _loadings(spark, k=1, rounds=12)
    _, _, vt = np.linalg.svd(_X, full_matrices=False)
    assert abs(float(np.dot(vs[0], vt[0]))) > 1 - 1e-8


def test_pca_topk_validates_arguments(spark):
    import pytest

    with pytest.raises(ValueError, match="k must be"):
        pca_topk(_corpus(spark), k=0)
    with pytest.raises(ValueError, match="rounds must be"):
        pca_topk(_corpus(spark), rounds=0)


def test_pca_topk_rejects_k_beyond_dimensionality(spark):
    """Beyond d the deflated iterate is round-off noise normalized into
    an arbitrary unit vector — the operator must refuse, not emit a
    direction that silently violates its orthogonality contract."""
    import pytest

    with pytest.raises(ValueError, match="dimensionality"):
        pca_topk(_corpus(spark), k=5, rounds=1)
