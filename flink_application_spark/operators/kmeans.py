"""Distributed k-means (Lloyd's) over an embedding column.

Scale design (the 100 TB shape):

- **Assignment** is a scan-local fold against *broadcast literal*
  centroids: per row, k squared-L2 distances computed as JVM-side
  ``zip_with``/``aggregate`` folds (no Python, no shuffle), argmin via
  ``array_min`` over ``(d2, cluster)`` structs — lexicographic min
  gives the deterministic lowest-cluster tie-break. Cost per row is
  O(k·d) inside whole-stage codegen; the embeddings never move.
- **Update** reuses the posexplode partial-agg shape from
  ``operators/pca.mean_vector``: the shuffle carries k·d partial sums
  per map partition — independent of corpus size, which is what makes
  an iteration 1000-executor-safe. The k×d centroid matrix comes back
  to the driver (tiny) and is re-broadcast as literals.
- **Iterations** are driver-orchestrated; each is one job. k-means at
  corpus scale is bounded by iterations × one-pass cost, and both
  halves above are single narrow/partial-agg passes.

This is the same sketch-to-driver / broadcast-back altitude as the
reference's enrichment loop (a huge table reduced to a tiny model and
re-joined to every row, cf. /root/reference/src/main/java/org/example/
EnrichmentApp.java lookup-dimension shape) — and it is exactly the
centroid machinery IVF ANN indexing needs (`operators/similarity.py`
trains its coarse quantizer the same way).

Determinism contract: init = embeddings of the k smallest ids (no
RNG); assignment math is sequential double folds so the DuckDB oracle
reproduces it bit-for-bit (same pattern as `similarity_queries._COS`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _d2_to_centroid(col: Column, centroid: list[float]) -> Column:
    """Squared L2 distance to a literal centroid as a sequential
    left-to-right double fold — the cross-engine-reproducible form."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(col, c, lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def assign_clusters(
    df: DataFrame, centroids: list[list[float]], col: str = "embedding"
) -> DataFrame:
    """Add ``cluster`` (argmin centroid index, ties → lowest index) and
    ``d2`` (squared L2 to it). Pure scan-local JVM expression work."""
    cands = F.array(
        *[
            F.struct(
                _d2_to_centroid(F.col(col), c).alias("d2"),
                F.lit(i).alias("cluster"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_min(cands)
    return df.withColumn("cluster", best["cluster"]).withColumn("d2", best["d2"])


def init_centroids(
    df: DataFrame, k: int, id_col: str, col: str = "embedding"
) -> list[list[float]]:
    """Deterministic seeding: the embeddings of the k smallest ids.
    (No k-means++ RNG — reproducibility across engines and reruns is
    worth more to a data pipeline than a marginally better seed; a
    caller who wants ++ seeding can pass its output as `centroids`.)"""
    rows = (
        df.filter(F.col(col).isNotNull())
        .orderBy(id_col)
        .limit(k)
        .select(col)
        .collect()
    )
    if len(rows) < k:
        raise ValueError(f"init_centroids: need {k} rows, found {len(rows)}")
    return [[float(x) for x in r[0]] for r in rows]


def update_centroids(assigned: DataFrame, k: int, col: str = "embedding") -> list[list[float]]:
    """Recompute means per cluster via posexplode partial agg (shuffle
    carries (cluster, pos) partials, never vectors). Empty clusters
    keep a zero vector (callers may re-seed; deterministic either way)."""
    rows = (
        assigned.select("cluster", F.posexplode(col).alias("pos", "val"))
        .groupBy("cluster", "pos")
        .agg(F.avg("val").alias("m"))
        .collect()
    )
    dim = 1 + max(r["pos"] for r in rows)
    cents = [[0.0] * dim for _ in range(k)]
    for r in rows:
        cents[r["cluster"]][r["pos"]] = float(r["m"])
    return cents


def kmeans_fit(
    df: DataFrame,
    k: int,
    id_col: str,
    col: str = "embedding",
    max_iters: int = 20,
    tol: float = 1e-6,
) -> tuple[list[list[float]], int]:
    """Lloyd's iterations until max centroid squared-shift ≤ tol.
    Returns (centroids, n_iters_run). Each iteration is two jobs:
    one assignment+update pass (they fuse — update reads the assigned
    frame) and the driver-side shift check."""
    df = df.filter(F.col(col).isNotNull())
    cents = init_centroids(df, k, id_col, col)
    iters = 0
    for _ in range(max_iters):
        iters += 1
        new = update_centroids(assign_clusters(df, cents, col), k, col)
        shift = max(
            sum((a - b) * (a - b) for a, b in zip(cn, co))
            for cn, co in zip(new, cents)
        )
        cents = new
        if shift <= tol:
            break
    return cents, iters


def cluster_profile(assigned: DataFrame) -> DataFrame:
    """Per-cluster size and mean within-cluster squared distance —
    the standard convergence/health readout."""
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("d2"), 4).alias("sum_d2"),
        )
        .orderBy("cluster")
    )
