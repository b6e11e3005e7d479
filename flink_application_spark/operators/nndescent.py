"""NN-Descent: distributed k-nearest-neighbor GRAPH construction
(Dong, Moses, Li — "Efficient k-nearest neighbor graph construction
for generic similarity measures", WWW 2011; re-derived for the
DataFrame model from the published algorithm).

The ANN queries elsewhere in this package answer "nearest neighbors
of a QUERY batch" (IVF/LSH retrieval). NN-Descent answers the
all-points form — "the kNN graph of the WHOLE corpus" — which is the
substrate for SemDeDup-style pruning, label-noise audits, UMAP-class
visualization, and graph-based ANN serving indexes. Brute force is
O(n²) in pairs; NN-Descent converges to a high-recall graph scoring
only locally-generated candidates, on the observed empirical cost of
~O(n^1.14) pair evaluations (WWW'11 §5).

Principle: *a neighbor of a neighbor is likely a neighbor.* Each
round, every vertex introduces its current neighbors (incoming and
outgoing — the "general neighbors" of the paper) to each other; the
newly met pairs are scored; every vertex keeps the k best edges seen
so far. Recall rises monotonically (the kept set only improves) and
the rounds contract geometrically on clustered data.

Spark shape (everything is equi-joins + windows — no cross product):

    G                                 (src, dst, cosine)  n·k rows
    B  = G ∪ reverse(G)               pivot-grouped "general neighbors"
    C  = B ⋈ B on pivot, peer_a<peer_b  candidate pairs, ≤ n·(2k)²
    C' = C ∖ already-scored            anti-join on the canonical pair
    S  = C' ⋈ emb ⋈ emb → Arrow cosine  candidates move, corpus doesn't
    G' = top-k per src over G ∪ S ∪ reverse(S)

At 100 TB: the graph state is n·k edges (ids + one double — NOT
vectors); embeddings are touched only by the candidate scoring join,
partitioned on vec_id both sides; the per-round shuffle is bounded by
the candidate count, which the paper's sampling (here: the top-
`sample_k` neighbors introduce each other, deterministic) caps at
n·(2·sample_k)². `localCheckpoint` per round truncates the iterative
lineage exactly like operators/graph.pagerank.

Determinism (the repo-wide discipline — no RNG anywhere): the initial
graph is a ring in md5-permuted id order (each vertex's first k
"random" acquaintances), every top-k tie breaks by (cosine DESC,
dst ASC), and candidate generation is set-algebra. Same inputs →
byte-identical graph under any partitioning (pinned in
tests/test_nndescent.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["pair_cosine_arrow", "nn_descent", "nn_descent_profile", "knn_graph_exact"]


def pair_cosine_arrow(va, vb):
    """Arrow-batched cosine between two array<float> columns, float64
    accumulation in ascending-coordinate order — the same left-to-right
    fold as functions.vectors.cosine, so the two paths agree bit-for-
    bit on identical inputs (pinned in tests/test_nndescent.py).
    NULL or length-mismatched pairs yield NULL (NaN → Arrow null)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them into names pyspark can't resolve here
    @pandas_udf("double")
    def _cos(a, b):
        out = np.full(len(a), np.nan)
        av, bv = a.tolist(), b.tolist()
        # vectorized column sweep (the brute_force_topk shape): stack
        # same-dimension pairs into matrices and accumulate per
        # coordinate j ascending — the IDENTICAL left-to-right float64
        # op order as the scalar fold, so values are bit-equal, but
        # the inner loop is d numpy ops per batch instead of
        # 3·d Python ops per PAIR (this UDF is the hot path of an
        # operator pitched at 100 TB)
        by_dim: dict[int, list[int]] = {}
        for i, (x, y) in enumerate(zip(av, bv)):
            if x is None or y is None or len(x) != len(y):
                continue  # NULL/mismatched pair → NaN → Arrow null
            by_dim.setdefault(len(x), []).append(i)
        for d, idxs in by_dim.items():
            X = np.array([av[i] for i in idxs], dtype=np.float64)
            Y = np.array([bv[i] for i in idxs], dtype=np.float64)
            dot = np.zeros(len(idxs), dtype=np.float64)
            nx = np.zeros(len(idxs), dtype=np.float64)
            ny = np.zeros(len(idxs), dtype=np.float64)
            for j in range(d):
                dot += X[:, j] * Y[:, j]
                nx += X[:, j] * X[:, j]
                ny += Y[:, j] * Y[:, j]
            with np.errstate(divide="ignore", invalid="ignore"):
                out[np.asarray(idxs)] = dot / (np.sqrt(nx) * np.sqrt(ny))
        return pd.Series(out)

    return _cos(va, vb)


def _score_pairs(pairs: DataFrame, emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id_a, id_b) → (id_a, id_b, cosine): two equi-joins pull the
    vectors to the candidate pairs (the corpus never cross-joins), one
    Arrow batch scores them. Cosine is ROUNDED to 6 decimals here —
    the same HALF_UP F.round the exact graph (`knn_graph_exact` →
    `brute_force_topk`) applies before ranking, so near-tie edges
    order identically in both graphs and a recall comparison never
    charges rounding-rank noise against NN-Descent."""
    ea = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    eb = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    return (
        pairs.join(ea, "id_a")
        .join(eb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                pair_cosine_arrow(F.col("_va"), F.col("_vb")), 6
            ).alias("cosine"),
        )
    )


def _ring_init(emb: DataFrame, k: int, id_col: str) -> DataFrame:
    """Deterministic 'random' initial acquaintances: vertices are laid
    on a ring in md5-permuted id order; each takes the next k ring
    positions. One window + one equi-join; every vertex gets exactly
    min(k, n-1) distinct non-self neighbors.

    The global-order window is the one serial step; it runs ONCE, on
    (id, position) pairs only — never vectors. At cluster scale the
    same ring comes from a sort-based zip (repartitionByRange on the
    md5 + per-partition offsets + partition-boundary stitch); the
    single-window form is the correct-by-construction baseline."""
    n = emb.count()
    w = Window.orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
    pos = emb.select(
        F.col(id_col).alias("_id"), (F.row_number().over(w) - 1).alias("_pos")
    )
    offs = F.explode(
        F.sequence(F.lit(1), F.lit(min(k, max(n - 1, 1))))
    ).alias("_off")
    want = pos.select("_id", "_pos", offs).withColumn(
        "_nbr_pos", (F.col("_pos") + F.col("_off")) % F.lit(n)
    )
    return (
        want.join(
            pos.select(F.col("_id").alias("_nbr"), F.col("_pos").alias("_nbr_pos")),
            "_nbr_pos",
        )
        # n <= k wraps the ring onto itself; never pair a vertex with itself
        .filter(F.col("_id") != F.col("_nbr"))
        .select(F.col("_id").alias("id_a"), F.col("_nbr").alias("id_b"))
    )


def _topk(edges: DataFrame, k: int) -> DataFrame:
    """Keep each src's k best edges; deterministic tie order."""
    w = Window.partitionBy("src").orderBy(F.col("cosine").desc(), F.col("dst").asc())
    return (
        edges.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("src", "dst", "cosine", "rank")
    )


def _directed(scored: DataFrame) -> DataFrame:
    """Scored canonical pairs → both edge directions."""
    fwd = scored.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst"), "cosine"
    )
    rev = scored.select(
        F.col("id_b").alias("src"), F.col("id_a").alias("dst"), "cosine"
    )
    return fwd.unionByName(rev)


def nn_descent(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    *,
    sample_k: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    _profile: list | None = None,
) -> DataFrame:
    """Approximate cosine kNN graph of `emb`: (src, dst, cosine, rank),
    exactly k edges per vertex (n·k rows), rank 1..k by descending
    cosine. NULL vectors are excluded up front (no content to
    neighbor on — the same contract as the set-similarity joins).

    `sample_k` bounds how many of a vertex's current neighbors
    introduce each other per round (the paper's ρ·k sampling, made
    deterministic: the TOP sample_k by the kept order) — candidate
    generation is then ≤ n·(2·sample_k)² pairs per round regardless
    of k. Default: k (no sampling).

    Recall rises with k (WWW'11 §5 — a larger kept set keeps more
    bridge edges alive for the local join): measured on a clustered
    16-dim corpus, k=6 converges to a ~0.5-recall local optimum while
    k=10 reaches 1.0 by round 6 (tests/test_nndescent.py pins the
    >= 0.9 contract at k=10). Size k to the use case, not the budget."""
    if k < 1 or n_iter < 0:
        raise ValueError(f"need k >= 1, n_iter >= 0; got k={k}, n_iter={n_iter}")
    sk = min(sample_k or k, k)
    emb = emb.filter(F.col(vec_col).isNotNull()).select(id_col, vec_col).persist()

    init = _ring_init(emb, k, id_col)
    graph = _topk(
        _directed(_score_pairs(init, emb, id_col, vec_col))
        .dropDuplicates(["src", "dst"]),
        k,
    ).localCheckpoint()
    # all-EVER-scored canonical pairs (the WWW'11 new/old-flag role):
    # anti-joining candidates against only the live graph re-scores
    # every previously-rejected pair each round — correctness-neutral
    # but unbounded wasted shuffle/UDF work. State is ids-only
    # (2 longs/pair), bounded by total pairs scored, checkpointed per
    # round like the graph itself.
    scored_ever = (
        init.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .localCheckpoint()
    )

    for it in range(n_iter):
        intro = graph.filter(F.col("rank") <= sk)
        # general neighbors: incoming ∪ outgoing around each pivot
        b = (
            intro.select(F.col("src").alias("pivot"), F.col("dst").alias("peer"))
            .unionByName(
                intro.select(F.col("dst").alias("pivot"), F.col("src").alias("peer"))
            )
            .dropDuplicates(["pivot", "peer"])
        )
        cand = (
            b.alias("x")
            .join(b.alias("y"), "pivot")
            .filter(F.col("x.peer") < F.col("y.peer"))
            .select(
                F.col("x.peer").alias("id_a"), F.col("y.peer").alias("id_b")
            )
            .dropDuplicates(["id_a", "id_b"])
        )
        fresh = cand.join(scored_ever, ["id_a", "id_b"], "left_anti")
        scored_ever = (
            scored_ever.unionByName(fresh)
            .dropDuplicates(["id_a", "id_b"])
            .localCheckpoint()
        )
        scored = _directed(_score_pairs(fresh, emb, id_col, vec_col))
        merged = _topk(
            graph.select("src", "dst", "cosine")
            .unionByName(scored)
            .dropDuplicates(["src", "dst"]),
            k,
        ).localCheckpoint()  # truncate iterative lineage (pagerank discipline)
        if _profile is not None:
            joined = merged.join(
                graph.select("src", "dst").withColumn("_old", F.lit(1)),
                ["src", "dst"],
                "left",
            )
            row = joined.agg(
                F.sum(F.when(F.col("_old").isNull(), 1).otherwise(0)).alias("new"),
                F.avg("cosine").alias("mean_cos"),
            ).collect()[0]
            _profile.append(
                {"iteration": it + 1, "new_edges": int(row["new"] or 0),
                 "mean_cosine": float(row["mean_cos"])}
            )
        graph = merged

    emb.unpersist()
    return graph.withColumnRenamed("src", id_col).withColumnRenamed("dst", "nbr_id")


def nn_descent_profile(
    emb: DataFrame,
    spark,
    k: int = 8,
    n_iter: int = 3,
    **kw,
) -> DataFrame:
    """Convergence readout: one row per NN-Descent round with the
    count of edges that entered a top-k list that round and the mean
    kept cosine. `new_edges` shrinking toward 0 IS the algorithm's
    termination signal (WWW'11 §3.2); `mean_cosine` is non-decreasing
    because every vertex's kept set only ever improves."""
    prof: list = []
    nn_descent(emb, k=k, n_iter=n_iter, _profile=prof, **kw)
    return spark.createDataFrame(
        [(p["iteration"], p["new_edges"], round(p["mean_cosine"], 6)) for p in prof],
        "iteration int, new_edges bigint, mean_cosine double",
    )


def knn_graph_exact(
    emb: DataFrame, k: int = 8, *, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine kNN graph via the Arrow brute-force scorer — the
    O(n²) baseline NN-Descent is measured against (INTENTIONALLY
    quadratic; its scale twin is nn_descent itself).

    Driver-memory bound: `brute_force_topk` COLLECTS the query side,
    and here the query side is the whole corpus — this baseline is
    for gate/test-scale corpora only (the same bound as every other
    INTENTIONALLY_QUADRATIC oracle baseline), never the 100 TB path."""
    from flink_application_spark.operators.similarity import brute_force_topk

    emb = emb.filter(F.col(vec_col).isNotNull()).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding")
    )
    g = brute_force_topk(emb, emb, k=k)
    return g.select(
        F.col("query_id").alias(id_col),
        F.col("vec_id").alias("nbr_id"),
        "cosine",
        "rank",
    )
