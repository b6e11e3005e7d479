"""Distributed PCA: Gram sketch, power iteration vs numpy eigh,
end-to-end projection vs a numpy reference, and the failure modes the
round-1 advice flagged (dim mismatch, null embeddings, axis-aligned
start vectors)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    FloatType,
    LongType,
    StructField,
    StructType,
)

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.pca import (
    collect_gram,
    mean_vector,
    pca_top_component_projection,
    top_component,
)

_SCHEMA = StructType(
    [
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
    ]
)


def _df(spark, mat, with_null=False):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(mat)]
    if with_null:
        rows.append((len(rows), None))
    return spark.createDataFrame(rows, _SCHEMA)


def _rng_mat(n=200, d=8, seed=7):
    rng = np.random.default_rng(seed)
    # anisotropic: one dominant direction so the top component is unambiguous
    base = rng.normal(size=(n, d))
    base[:, 0] *= 5.0
    return np.float64(np.float32(base))  # round-trip float32 like the table


def test_gram_matches_numpy(spark):
    x = _rng_mat()
    g, n = collect_gram(_df(spark, x), dim=8)
    assert n == x.shape[0]
    np.testing.assert_allclose(g, x.T @ x, rtol=1e-10, atol=1e-8)


def test_top_component_matches_eigh(spark):
    x = _rng_mat()
    mu = x.mean(axis=0)
    g, n = collect_gram(_df(spark, x), dim=8)
    v = top_component(g, n, mu)
    cov = g / n - np.outer(mu, mu)
    w, vecs = np.linalg.eigh(cov)
    ref = vecs[:, -1]
    if ref[int(np.argmax(np.abs(ref)))] < 0:
        ref = -ref
    np.testing.assert_allclose(v, ref, atol=1e-5)
    lam = v @ cov @ v
    assert np.linalg.norm(cov @ v - lam * v) <= 1e-6 * abs(lam)


def test_top_component_survives_ones_orthogonal_eigenvector():
    """The old all-ones start was orthogonal to any eigenvector with
    zero sum — e.g. a pure difference direction. The sin-ramp start
    must still find it."""
    d = 4
    ref = np.zeros(d)
    ref[0], ref[1] = 1 / np.sqrt(2), -1 / np.sqrt(2)  # sums to zero
    cov = 10.0 * np.outer(ref, ref) + np.eye(d)
    gram = cov  # pretend n=1, mean=0
    v = top_component(gram, 1, np.zeros(d))
    assert abs(abs(v @ ref) - 1.0) < 1e-6


def test_gram_dim_mismatch_raises(spark):
    x = _rng_mat(d=8)
    with pytest.raises(Exception, match="embedding length"):
        collect_gram(_df(spark, x), dim=16)


def test_projection_null_consistency(spark):
    """Null embeddings are filtered once up front: output excludes them
    and the stats match the no-null run exactly."""
    x = _rng_mat(n=50)
    clean = pca_top_component_projection(_df(spark, x), dim=8)
    dirty = pca_top_component_projection(_df(spark, x, with_null=True), dim=8)
    a = {r["vec_id"]: r["pc1"] for r in clean.collect()}
    b = {r["vec_id"]: r["pc1"] for r in dirty.collect()}
    assert a == b


def test_projection_matches_numpy_reference(spark, sf_dir):
    emb = register_views(spark, sf_dir, tables=("embeddings",))["embeddings"]
    rows = emb.filter(F.col("embedding").isNotNull()).collect()
    x = np.asarray([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    ids = np.asarray([r["vec_id"] for r in rows])
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, bias=True)
    _, vecs = np.linalg.eigh(cov)
    ref = vecs[:, -1]
    if ref[int(np.argmax(np.abs(ref)))] < 0:
        ref = -ref
    expected = dict(zip(ids.tolist(), np.round((x - mu) @ ref, 4).tolist()))
    got = {
        r["vec_id"]: r["pc1"]
        for r in pca_top_component_projection(emb, dim=64).collect()
    }
    assert len(got) == len(expected)
    mismatches = [
        k for k in expected if abs(got[k] - expected[k]) > 2e-4
    ]
    assert not mismatches, mismatches[:5]


def test_mean_vector(spark):
    x = _rng_mat(n=30)
    mu = mean_vector(_df(spark, x), dim=8)
    np.testing.assert_allclose(mu, x.mean(axis=0), rtol=1e-7, atol=1e-9)


def test_top_components_match_eigh(spark):
    from flink_application_spark.operators.pca import top_components

    x = _rng_mat()
    x[:, 1] *= 3.0  # second dominant direction so top-2 is unambiguous
    mu = x.mean(axis=0)
    g, n = collect_gram(_df(spark, x), dim=8)
    comps = top_components(g, n, mu, k=2)
    cov = g / n - np.outer(mu, mu)
    w, vecs = np.linalg.eigh(cov)
    for i in range(2):
        ref = vecs[:, -1 - i]
        if ref[int(np.argmax(np.abs(ref)))] < 0:
            ref = -ref
        np.testing.assert_allclose(comps[i], ref, atol=1e-4)
    # orthogonality of extracted components
    assert abs(float(comps[0] @ comps[1])) < 1e-6


def test_topk_projection_matches_numpy(spark):
    from flink_application_spark.operators.pca import pca_topk_projection

    x = _rng_mat(n=60)
    x[:, 1] *= 3.0
    mu = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, bias=True)
    _, vecs = np.linalg.eigh(cov)
    refs = []
    for i in range(2):
        r = vecs[:, -1 - i]
        if r[int(np.argmax(np.abs(r)))] < 0:
            r = -r
        refs.append(r)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in pca_topk_projection(_df(spark, x), k=2, dim=8).collect()
    }
    centered = x - mu
    for i in range(60):
        assert abs(got[i][0] - round(float(centered[i] @ refs[0]), 4)) <= 2e-4
        assert abs(got[i][1] - round(float(centered[i] @ refs[1]), 4)) <= 2e-4


def test_gram_skips_null_embeddings(spark):
    """A corpus with NULL embedding rows must not crash (np.asarray
    over ragged None rows) or skew the Gram: NULLs are filtered before
    the Arrow stage, matching rotate_embeddings/pq_encode (round-4
    latent-hardening note)."""
    import numpy as np

    from flink_application_spark.operators.pca import collect_gram

    d = 4
    rows = [(0, [1.0, 0.0, 2.0, 0.0]), (1, None), (2, [0.0, 3.0, 0.0, 1.0]), (3, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g, n = collect_gram(df, dim=d)
    x = np.array([rows[0][1], rows[2][1]])
    assert n == 2
    np.testing.assert_allclose(g, x.T @ x, atol=1e-12)
