"""NN-Descent kNN-graph queries (operators/nndescent.py).

All three are rows-only at the driver gate: NN-Descent is iterative
and its intermediate candidate sets are path-dependent — a static SQL
string cannot replay it (the same class as k-means fitting and the LR
trainers). Correctness is pinned instead by tests/test_nndescent.py:
the Arrow pair scorer is bit-identical to the JVM cosine fold, the
graph is byte-deterministic under repartitioning, recall ≥ 0.9 on
clustered corpora vs the exact graph, and convergence (new_edges ↓,
mean kept cosine ↑) is asserted per round. The recall readout below
additionally PUBLISHES the measured driver-data number every gate run
— the same honesty discipline as doc_lsh_recall_audit /
emb_ivf_recall_curve: the driver's embeddings are isotropic random,
so the printed recall is the hard regime, not a cherry-pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.nndescent import (
    knn_graph_exact,
    nn_descent,
    nn_descent_profile,
)
from flink_application_spark.plans.registry import register

_K = 6
_ITERS = 3


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return register_views(spark, sf_dir, tables=("embeddings",))[
        "embeddings"
    ].filter(F.col("embedding").isNotNull())


@register(
    "emb_knn_graph_nndescent",
    None,  # iterative, data-dependent → rows-only; contracts in tests
    doc="Approximate all-points cosine kNN graph via NN-Descent (Dong "
    "et al., WWW'11): k=6 neighbors per vector after 3 "
    "neighbor-of-neighbor rounds, every round only equi-joins + "
    "windows (candidates ≤ n·(2k)² pairs, embeddings touched only by "
    "the candidate scoring join). The graph substrate for SemDeDup, "
    "label-noise audits and graph-ANN serving at 100 TB, where the "
    "O(n²) exact graph is unbuildable. Determinism, recall and "
    "convergence contracts: tests/test_nndescent.py.",
    tags=("embeddings", "similarity", "knn-graph", "ann", "iterative"),
)
def q_knn_graph_nndescent(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = nn_descent(_emb(spark, sf_dir), k=_K, n_iter=_ITERS)
    return g.select(
        "vec_id", "nbr_id", F.round("cosine", 6).alias("cosine"), "rank"
    )


@register(
    "emb_knn_graph_recall",
    None,
    doc="Recall readout of the NN-Descent graph against the exact "
    "Arrow brute-force kNN graph on the same corpus — one row: vertex "
    "count, edge count, matched edges, recall in integer ppm (exact "
    "integer arithmetic, no float hashing). The published number for "
    "the hard isotropic regime; the ≥ 0.9 clustered-data contract "
    "lives in tests/test_nndescent.py (same split as the IVF/LSH "
    "recall audits).",
    tags=("embeddings", "similarity", "knn-graph", "ann", "audit"),
)
def q_knn_graph_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    approx = nn_descent(emb, k=_K, n_iter=_ITERS).select("vec_id", "nbr_id")
    exact = knn_graph_exact(emb, k=_K).select("vec_id", "nbr_id")
    hit = approx.join(exact, ["vec_id", "nbr_id"], "left_semi")
    return (
        exact.agg(
            F.count(F.lit(1)).alias("exact_edges"),
            F.countDistinct("vec_id").alias("n_vertices"),
        )
        .crossJoin(hit.agg(F.count(F.lit(1)).alias("matched_edges")))
        .select(
            "n_vertices",
            "exact_edges",
            "matched_edges",
            (F.col("matched_edges") * 1000000 / F.col("exact_edges"))
            .cast("bigint")
            .alias("recall_ppm"),
        )
    )


@register(
    "emb_nn_descent_convergence",
    None,
    doc="NN-Descent convergence profile: per round, how many edges "
    "entered a top-k list and the mean kept cosine. new_edges "
    "shrinking toward 0 is the paper's termination signal (WWW'11 "
    "§3.2); mean_cosine is non-decreasing because kept sets only "
    "improve — both asserted in tests/test_nndescent.py.",
    tags=("embeddings", "similarity", "knn-graph", "iterative", "audit"),
)
def q_nn_descent_convergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nn_descent_profile(_emb(spark, sf_dir), spark, k=_K, n_iter=_ITERS)
