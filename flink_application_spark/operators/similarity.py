"""Similarity search over embedding columns (``array<float>``).

Two strategies:

- **Brute-force top-k** — baseline: broadcast the (small) query set
  against the corpus; cosine is a JVM-side zip_with/aggregate fold.
  At 100 TB the corpus side stays partitioned; cost is one scan per
  query batch — correct but O(|Q|·|C|).
- **LSH-bucketed ANN** — scale path: both sides get a sign-bit bucket
  key (axis-aligned hyperplanes); the join is equi on bucket, so
  Catalyst plans a hash join instead of a cross product. Recall is
  tunable via n_bits (fewer bits → bigger buckets → higher recall).
  An IVF variant would k-means the corpus and probe nearest centroids;
  bucketing is the deterministic, oracle-able stand-in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_application_spark.functions.vectors import cosine, sign_bits


def _topk_per_query(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def brute_force_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 10
) -> DataFrame:
    """Exact cosine top-k. `queries` must be small (it is broadcast);
    rows with query_id == vec_id are excluded (self-match)."""
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
    )
    scored = (
        corpus.crossJoin(q)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    return _topk_per_query(scored, k)


def lsh_ann_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5, n_bits: int = 8
) -> DataFrame:
    """Approximate top-k: candidates share the sign-bit LSH bucket.
    Equi-join on bucket key — no cross product, shuffle on bucket."""
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        sign_bits(F.col("embedding"), n_bits).alias("bucket"),
    )
    c = corpus.select(
        "vec_id", "embedding", sign_bits(F.col("embedding"), n_bits).alias("bucket")
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(cosine(F.col("qv"), F.col("embedding")), 6).alias("cosine"),
        )
    )
    return _topk_per_query(scored, k)


def cosine_near_dup_pairs(corpus: DataFrame, threshold: float) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (a < b) above threshold.

    Quadratic candidate generation blocked by the LSH bucket (pairs in
    different buckets can still exceed the threshold — documented
    recall trade-off; exact variant would use the brute-force path)."""
    withb = corpus.select(
        "vec_id", "embedding", sign_bits(F.col("embedding"), 4).alias("bucket")
    )
    a = withb.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"), "bucket"
    )
    b = withb.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"), "bucket"
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
        .distinct()
    )
