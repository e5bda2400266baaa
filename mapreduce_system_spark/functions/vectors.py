"""Vector math over ``array<float>`` embedding columns.

All operations cast elements to double and fold sequentially with
``F.aggregate`` (a deterministic left-to-right sum, matching the DuckDB
oracle's evaluation order closely enough that results agree to ~1e-15 and
exactly after rounding). Pure column expressions — no UDFs — so similarity
search stays JVM-side and codegen'd.

Scale notes: brute-force cosine against a small query set is a broadcast
nested-loop (query side broadcast, O(N·Q·d) flops, embarrassingly
parallel); at 100 TB switch to the LSH-bucketed variant in
``operators.similarity`` which turns the cross product into an equi-join on
bucket id.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm.

    Cross-engine note: DuckDB's ``list_cosine_similarity`` returns -1.0
    for a zero-norm input, so an un-thresholded oracle (top-k rankings,
    crossmodal cosine output) would diverge from this 0.0 convention IF
    the fixture ever contained a zero vector. No fixture embedding has
    zero norm — pinned by
    tests/test_similarity.py::test_fixture_embeddings_have_no_zero_norm
    so a regenerated corpus that breaks the assumption fails loudly
    instead of surfacing as an opaque hash mismatch."""
    d = dot(a, b)
    n = norm(a) * norm(b)
    # NULL input stays NULL (matching DuckDB's list_cosine_similarity):
    # the old single when() sent a NULL norm into the otherwise branch,
    # silently scoring a NULL vector 0.0 — rankable, and divergent from
    # any oracle (r10 review)
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("double"))
        .when(n > 0, d / n)
        .otherwise(F.lit(0.0))
    )


def dot_double(a: Column, b: Column) -> Column:
    """Dot product for arrays already in double precision (no casts) —
    the pair-scoring hot path over precomputed unit vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_unit_vector(df, vec_col: str, unit_col: str = "unit"):
    """Add ``unit_col`` = vec/‖vec‖ (all-zeros when ‖vec‖=0).

    Norms are computed ONCE PER ROW here; pairwise cosine then reduces to
    a single dot product — at Q queries or B-sized blocks this turns
    O(pairs·3d) fold work into O(rows·2d + pairs·d).

    The norm is let-bound as a lambda variable (``transform(array(norm))
    [0]``) rather than materialized as a temp column: referencing the raw
    norm expression inside the per-element division would re-fold it per
    element, and a temp column would silently clobber any caller column
    of the same name."""
    dbl = _as_double(F.col(vec_col))

    def unit(nn: Column) -> Column:
        return F.when(nn > 0, F.transform(dbl, lambda x: x / nn)).otherwise(
            F.transform(dbl, lambda x: F.lit(0.0))
        )

    return df.withColumn(
        unit_col, F.transform(F.array(norm(F.col(vec_col))), unit)[0]
    )
