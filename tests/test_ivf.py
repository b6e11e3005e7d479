"""IVF ANN properties: exactness at full probe, recall at partial probe."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    train_centroids,
)


def _emb(spark, sf_dir):
    return register_views(spark, sf_dir, tables=("embeddings",))["embeddings"]


def test_full_probe_equals_bruteforce(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    cents = train_centroids(emb, n_centroids=8)
    exact = brute_force_topk(q, emb, k=5)
    ivf = ivf_topk(q, emb, k=5, n_probe=8, centroids=cents)
    e = {(r.query_id, r.vec_id, r.cosine) for r in exact.collect()}
    g = {(r.query_id, r.vec_id, r.cosine) for r in ivf.collect()}
    assert g == e


def test_partial_probe_recall(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    cents = train_centroids(emb, n_centroids=8)
    exact = brute_force_topk(q, emb, k=5)
    ivf = ivf_topk(q, emb, k=5, n_probe=3, centroids=cents)
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    g = {(r.query_id, r.vec_id) for r in ivf.collect()}
    recall = len(e & g) / len(e)
    assert recall >= 0.5, f"recall {recall:.2f} too low"


def test_centroids_deterministic(spark, sf_dir):
    import numpy as np

    emb = _emb(spark, sf_dir)
    c1 = train_centroids(emb, n_centroids=8)
    c2 = train_centroids(emb, n_centroids=8)
    assert np.array_equal(c1, c2)
