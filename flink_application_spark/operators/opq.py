"""OPQ-style rotation for product quantization (Ge et al., CVPR'13
"Optimized Product Quantization", the parametric solution §4): rotate
vectors into the PCA eigenbasis, then allocate eigen-dimensions to the
m subspaces so each subspace carries a balanced share of the variance.

Why it helps PQ: product quantization quantizes each sub_dim-slice
independently, so error concentrates in whichever subspace happens to
hold the most variance. A rotation is free at query time (rotate the
query once) and lets the allocator even the variance out — the
parametric OPQ initialization, which Ge et al. show captures most of
the iterative OPQ gain when the data is roughly Gaussian.

Spark-first split of labor: the ONLY corpus pass is the distributed
Gram accumulation (`pca.gram_long` — d² partials per Arrow batch, one
d²-row shuffle); the d×d eigendecomposition and the greedy balanced
allocation are driver-side numpy on a 64×64 matrix. Applying the
rotation is one Arrow-batched matmul per batch (X @ R), scan-local.

Determinism: eigh on the same Gram is deterministic; each eigenvector's
sign is fixed by making its largest-|component| coordinate positive,
and ties in the allocator resolve by bucket index — so the rotation is
a pure function of the data and the registered comparison query is
reproducible run-over-run (pinned in tests/test_opq.py).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame

from flink_application_spark.operators.pca import collect_gram, mean_vector


def pca_rotation_balanced(
    emb: DataFrame, dim: int, m: int, col: str = "embedding"
) -> np.ndarray:
    """d×d orthogonal rotation: PCA eigenbasis with eigen-dimensions
    greedily allocated to m equal-size subspaces balancing per-subspace
    variance (largest eigenvalue first, into the open bucket with the
    smallest variance sum). Columns are ordered bucket-by-bucket, so
    slicing the rotated vector into m contiguous sub_dim blocks yields
    the balanced subspaces PQ will quantize."""
    if dim % m != 0:
        raise ValueError(f"dim={dim} not divisible by m={m}")
    sub_dim = dim // m
    g, n = collect_gram(emb, col=col, dim=dim)
    if n == 0:
        raise ValueError("pca_rotation_balanced: empty input")
    mu = mean_vector(emb, col=col, dim=dim)
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order], evecs[:, order]
    # deterministic sign: largest-|component| coordinate positive
    for j in range(dim):
        i = int(np.argmax(np.abs(evecs[:, j])))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    # greedy balanced allocation (Ge'13 §4.2 flavor, sums not products:
    # recon error is additive in variance, so balance the sums)
    sums = [0.0] * m
    members: list[list[int]] = [[] for _ in range(m)]
    for j in range(dim):  # eigenvalues descending
        open_buckets = [b for b in range(m) if len(members[b]) < sub_dim]
        b = min(open_buckets, key=lambda b: (sums[b], b))
        members[b].append(j)
        sums[b] += float(evals[j])
    perm = [j for bucket in members for j in bucket]
    return np.ascontiguousarray(evecs[:, perm])


def rotate_embeddings(
    emb: DataFrame, rotation: np.ndarray, col: str = "embedding"
) -> DataFrame:
    """Apply the rotation (one Arrow matmul per batch, scan-local —
    the corpus never shuffles). Output schema matches the input's
    (vec_id, embedding) contract so every downstream quantizer drops
    in unchanged. NULL embeddings pass through as NULL."""
    import pandas as pd

    from flink_application_spark.catalog import fan_out

    r = np.asarray(rotation, dtype=np.float64)
    dim = r.shape[0]

    def part(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            out_vecs = []
            for v in pdf[col]:
                if v is None or len(v) != dim:
                    out_vecs.append(None)
                else:
                    out_vecs.append(
                        (np.asarray(v, dtype=np.float64) @ r).tolist()
                    )
            yield pd.DataFrame({"vec_id": pdf["vec_id"], col: out_vecs})

    return fan_out(emb.select("vec_id", col)).mapInPandas(
        part, schema=f"vec_id bigint, {col} array<double>"
    )
