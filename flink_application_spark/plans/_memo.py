"""Session-scoped memos for pure driver-side training artifacts
shared by several registered queries (the lr_queries `_FIT_CACHE`
pattern, hoisted so different plan modules can share one run).

Every cached value is a pure function of (application, sf_dir,
params) — bit-deterministic by the operators' own contracts — and is
small driver state (k·d integers, n·k edge ids), never a DataFrame:
frames are rebuilt per call via `spark.createDataFrame`, so cached
results behave identically to fresh ones under any partitioning.
One driver correctness window runs the kmeans fit 2× (profile +
trained IVF) and the NN-Descent build 5× (graph, recall,
convergence, and both graph-ANN queries) without this; training cost
is real, the cache is not."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_KMEANS: dict[tuple, tuple[list[list[int]], list]] = {}
_GRAPH: dict[tuple, tuple[list, list]] = {}


def kmeans_fit_exact_cached(
    spark: SparkSession, emb: DataFrame, sf_dir: str, k: int, iters: int
) -> tuple[list[list[int]], list]:
    """(final ppm centroids, per-iteration profile) of the exact
    Lloyd's loop over the sf_dir embeddings table."""
    from flink_application_spark.operators.kmeans_exact import kmeans_fit_exact

    key = (spark.sparkContext.applicationId, sf_dir, k, iters)
    if key not in _KMEANS:
        _KMEANS[key] = kmeans_fit_exact(emb, k=k, iters=iters)
    return _KMEANS[key]


def nn_descent_graph_cached(
    spark: SparkSession, emb: DataFrame, sf_dir: str, k: int, n_iter: int
) -> tuple[DataFrame, list]:
    """(graph frame (vec_id, nbr_id, d2, rank), profile rows
    (iteration, new_edges, kept_d2_sum)) of the exact NN-Descent run
    over the sf_dir embeddings table — built once per session, with
    the convergence profile captured on the same run."""
    from flink_application_spark.operators.nndescent_exact import nn_descent_exact

    key = (spark.sparkContext.applicationId, sf_dir, k, n_iter)
    if key not in _GRAPH:
        prof: list = []
        rows = nn_descent_exact(emb, k=k, n_iter=n_iter, _profile=prof).collect()
        _GRAPH[key] = (
            [(r["vec_id"], r["nbr_id"], r["d2"], r["rank"]) for r in rows],
            prof,
        )
    rows, prof = _GRAPH[key]
    return (
        spark.createDataFrame(
            rows, "vec_id bigint, nbr_id bigint, d2 bigint, rank int"
        ),
        prof,
    )
