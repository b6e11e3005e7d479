"""Persisted IVF ANN index — the build-once / query-many lifecycle the
in-memory `operators/similarity.ivf_topk` path implies but doesn't
materialize. At 100 TB the index IS the artifact: training and the
corpus assignment pass run once (the expensive scans), then every
query session loads kilobytes of centroids plus a centroid-bucketed
parquet table and probes only matching partitions.

Layout under ``index_dir``:

- ``centroids/``  — (cluster, pos, val) long-form centroid matrix
  (tiny; engine-portable, no pickles);
- ``lists/``      — the inverted lists: (cluster, vec_id, embedding)
  written ``partitionBy(cluster)`` so a probe of p clusters reads
  only p directories (partition pruning on the list id — the scan
  cost is data-touched, not corpus size);
- ``meta/``       — one row of build parameters for validation.

Queries re-use the exact scoring/rank machinery of the in-memory path
(`_assign_udf`, cosine folds), so recall characteristics are
identical — pinned in tests/test_ann_index.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_application_spark.functions.vectors import cosine
from flink_application_spark.operators.similarity import (
    _assign_udf,
    _topk_per_query,
    train_centroids,
)


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    *,
    n_centroids: int = 16,
    centroids=None,
) -> None:
    """One-time build: train (or accept) centroids, assign every corpus
    vector to its nearest list, persist centroid-bucketed."""
    import numpy as np

    if centroids is None:
        centroids = train_centroids(corpus, n_centroids=n_centroids)
    centroids = np.asarray(centroids, dtype=float)
    spark = corpus.sparkSession

    cent_rows = [
        (int(c), int(p), float(v))
        for c, row in enumerate(centroids)
        for p, v in enumerate(row)
    ]
    spark.createDataFrame(
        cent_rows, "cluster int, pos int, val double"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(index_dir, "centroids"))

    assign1 = _assign_udf(centroids, 1)
    (
        corpus.select(
            "vec_id",
            "embedding",
            F.element_at(assign1(F.col("embedding")), 1).alias("cluster"),
        )
        .repartition("cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(os.path.join(index_dir, "lists"))
    )
    spark.createDataFrame(
        [(int(centroids.shape[0]), int(centroids.shape[1]))],
        "n_centroids int, dim int",
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(index_dir, "meta"))


def load_centroids(spark: SparkSession, index_dir: str):
    import numpy as np

    meta = spark.read.parquet(os.path.join(index_dir, "meta")).collect()[0]
    cents = np.zeros((meta["n_centroids"], meta["dim"]))
    for r in spark.read.parquet(os.path.join(index_dir, "centroids")).collect():
        cents[r["cluster"], r["pos"]] = r["val"]
    return cents


def query_ivf_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Probe the persisted index: queries map to their n_probe nearest
    centroids; the cluster equi-filter prunes the list scan to the
    probed partitions (partition pruning on the `cluster` hive key)."""
    centroids = load_centroids(spark, index_dir)
    lists = spark.read.parquet(os.path.join(index_dir, "lists"))
    assignp = _assign_udf(centroids, n_probe)
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        F.explode(assignp(F.col("embedding"))).alias("cluster"),
    )
    scored = (
        lists.join(F.broadcast(q), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
        .distinct()
    )
    return _topk_per_query(scored, k)
