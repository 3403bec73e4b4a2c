"""Distance kernels (SURVEY.md §2.6 K1-K4) as pure Spark SQL expressions.

The reference implements these as SIMD C++ (`space_l2.h`, `space_ip.h`,
`uint8_knn.hpp`); on Spark the idiomatic equivalents are higher-order
array expressions — they stay JVM-side inside whole-stage codegen, so no
Python boundary is crossed.  The numpy fast path for the k-NN inner loop
lives in operators/knn.py (Arrow-batched), not here.

Numeric contract: accumulate in DOUBLE, left-to-right (aggregate() is a
sequential fold), so results are deterministic and reproducible against
the DuckDB oracle.  For integer (uint8-style) vectors the same
expressions keep an exact integer domain when inputs are integral
(SURVEY.md K2: int64 accumulators).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def l2_sq(a: Column, b: Column) -> Column:
    """Squared L2 distance Σ(x−y)² (reference: `space_l2.h:6-20`, `:376-413`).

    Squared — not rooted — exactly as the reference computes it; ranking is
    identical and the arithmetic stays exact for integer inputs.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_sq_int(a: Column, b: Column) -> Column:
    """Integer squared L2 with int64 accumulators (reference K2,
    `space_l2.h:376-413`: integer distances for uint8/int8 vectors).
    Exact — no floating point anywhere, so oracle hashes match by
    construction (SURVEY.md §7 'uint8 arithmetic')."""
    return F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (x.cast("long") - y.cast("long")) * (x.cast("long") - y.cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def dot(a: Column, b: Column) -> Column:
    """Inner product Σ x·y (reference: `space_ip.h:6-19`)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sq_norm(a: Column) -> Column:
    """Squared norm Σ x² (reference: `uint8_knn.hpp:31-37`) — materialize as
    a column once, reuse across queries (the reference precomputes xnorms)."""
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_sim(a: Column, b: Column) -> Column:
    """Cosine similarity (reference: normalize+IP path, `bindings.cpp:244-251`;
    we implement the correct formula — the reference's uint8 normalize is
    arithmetically broken and explicitly not reproduced, SURVEY.md K3)."""
    return dot(a, b) / (F.sqrt(sq_norm(a)) * F.sqrt(sq_norm(b)))
