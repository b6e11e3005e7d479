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


def srp_signs(n_bits: int, dim: int, salt: str = "srp") -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix for sign-random-projection:
    sign(bit j, dim k) from the parity of md5(f"{salt}:{j}:{k}").
    Pseudo-random but reproducible in any engine — the same literals
    are inlined into the DuckDB oracle SQL."""
    import hashlib

    if n_bits > 63:
        raise ValueError(
            f"srp signatures are BIGINT-encoded: n_bits must be <= 63, got {n_bits} "
            "(bit 63 would need 2^63, overflowing the signed long literal)"
        )
    return [
        [
            1.0
            if int(hashlib.md5(f"{salt}:{j}:{k}".encode()).hexdigest()[0], 16) < 8
            else -1.0
            for k in range(dim)
        ]
        for j in range(n_bits)
    ]


def srp_signature(a: Column, signs: list[list[float]]) -> Column:
    """SimHash-for-vectors: ``n_bits``-bit signature as a BIGINT, bit j
    set iff the dot product with hyperplane j is ≥ 0. Full-rank random
    hyperplanes (vs sign_bits' axis-aligned ones) — the genuine
    Charikar SRP family; P[bit match] = 1 − θ/π. All JVM-side folds."""
    bits = []
    for j, row in enumerate(signs):
        plane = F.array(*[F.lit(s) for s in row])
        d = dot(a, plane)
        bits.append(F.when(d >= 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint")))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out
