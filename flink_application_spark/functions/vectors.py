"""Vector column expressions over ``array<float>`` embeddings.

All JVM-side higher-order functions (zip_with/aggregate) — the
embeddings never cross into Python. Arithmetic is double-precision
left-to-right folds, matching the DuckDB oracle's list functions; query
outputs round similarity values so ulp noise can't flip hashes.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a,
            F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sign_bits(a: Column, n_bits: int) -> Column:
    """Axis-aligned random-hyperplane LSH bucket: the sign pattern of the
    first ``n_bits`` coordinates as a '01' string. Cheap, deterministic,
    and a genuine LSH family for cosine distance (each coordinate is a
    hyperplane through the origin)."""
    return F.concat(
        *[
            F.when(F.element_at(a, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_bits)
        ]
    )
