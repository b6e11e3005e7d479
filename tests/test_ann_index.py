"""Persisted IVF index: query results equal the in-memory IVF path
with the same centroids, and the probe scan is partition-pruned."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.ann_index import (
    build_ivf_index,
    load_centroids,
    query_ivf_index,
)
from flink_application_spark.operators.similarity import ivf_topk, train_centroids


def test_persisted_index_equals_in_memory_ivf(spark, sf_dir, tmp_path):
    emb = register_views(spark, sf_dir, tables=("embeddings",))["embeddings"]
    idx = str(tmp_path / "ivf")
    cents = train_centroids(emb, n_centroids=8)
    build_ivf_index(emb, idx, centroids=cents)

    queries = emb.filter(F.col("vec_id") < 10)
    got = {
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in query_ivf_index(spark, idx, queries, k=5, n_probe=3).collect()
    }
    want = {
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"])
        for r in ivf_topk(
            queries, emb, k=5, n_probe=3, centroids=cents
        ).collect()
    }
    assert got == want and len(want) == 50

    # round-trip: centroids reload exactly
    import numpy as np

    assert np.allclose(load_centroids(spark, idx), np.asarray(cents))


def test_probe_scan_is_partition_pruned(spark, sf_dir, tmp_path):
    """The lists scan must prune to the probed clusters — reading a
    single-cluster filter touches one hive partition, not the corpus
    (the property that makes the persisted index pay off at scale)."""
    emb = register_views(spark, sf_dir, tables=("embeddings",))["embeddings"]
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_centroids=8)
    lists = spark.read.parquet(f"{idx}/lists")
    pruned = lists.filter(F.col("cluster") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # partition filter visible in the scan, and row count < corpus
    assert "cluster" in plan
    assert 0 < pruned.count() < emb.count()
