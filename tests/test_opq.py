"""OPQ rotation invariants: orthogonality, isometry (norms preserved
through the rotation), deterministic reproducibility, and the measured
point of the whole exercise — rotated PQ must not reconstruct worse
than raw PQ on the fixture corpus."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from flink_application_spark.catalog import load_table
from flink_application_spark.operators.opq import (
    pca_rotation_balanced,
    rotate_embeddings,
)
from flink_application_spark.plans.opq_queries import opq_compare_frame

SF = "/root/testdata/sf0.001"
_DIM, _M = 64, 4


def test_rotation_is_orthogonal_and_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    r1 = pca_rotation_balanced(emb, _DIM, _M)
    r2 = pca_rotation_balanced(emb, _DIM, _M)
    assert np.abs(r1 @ r1.T - np.eye(_DIM)).max() < 1e-10
    assert np.array_equal(r1, r2)


def test_rotation_preserves_norms(spark):
    emb = load_table(spark, SF, "embeddings")
    r = pca_rotation_balanced(emb, _DIM, _M)
    rot = rotate_embeddings(emb, r)

    def total_energy(df):
        return df.select(
            F.aggregate(
                "embedding",
                F.lit(0.0),
                lambda acc, x: acc + x.cast("double") * x.cast("double"),
            ).alias("e")
        ).agg(F.sum("e")).collect()[0][0]

    raw_e = total_energy(emb.filter(F.col("embedding").isNotNull()))
    rot_e = total_energy(rot.filter(F.col("embedding").isNotNull()))
    assert abs(raw_e - rot_e) / raw_e < 1e-9


def test_balanced_subspace_variance(spark):
    # the allocator's job: per-subspace variance sums far closer than
    # the unpermuted eigen order would give (desc order stacks the top
    # eigenvalues into subspace 0)
    emb = load_table(spark, SF, "embeddings")
    r = pca_rotation_balanced(emb, _DIM, _M)
    x = np.array(
        [row["embedding"] for row in emb.filter("embedding IS NOT NULL").collect()],
        dtype=np.float64,
    )
    xr = x @ r
    sub = _DIM // _M
    var = xr.var(axis=0)
    sums = [var[s * sub : (s + 1) * sub].sum() for s in range(_M)]
    assert max(sums) / min(sums) < 1.5, sums


def test_opq_does_not_reconstruct_worse(spark):
    emb = load_table(spark, SF, "embeddings")
    got = {r["variant"]: r for r in opq_compare_frame(emb).collect()}
    assert got["raw"]["n_vecs"] == got["opq"]["n_vecs"] > 0
    assert got["opq"]["mse"] <= got["raw"]["mse"]
