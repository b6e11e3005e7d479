"""Greedy beam search over the kNN graph — the SERVING-side
complement of NN-Descent (graph-based approximate nearest-neighbor
search: GNNS, Hajebi et al., IJCAI 2011; the layer-0 search procedure
of HNSW, Malkov & Yashunin, arXiv:1603.09320 — re-derived for the
DataFrame model from the published algorithms).

`operators/nndescent_exact.py` BUILDS the graph; this module ANSWERS
QUERIES with it: start a beam at fixed entry points, repeatedly score
the beam's out-neighbors against the query and keep the best `beam`
vertices, stop after a fixed number of hops, return the top-k of the
final beam. On navigable-small-world-ish graphs the beam converges to
the true neighborhood in a handful of hops while touching only
beam·k·steps vertices per query — the serving pattern that makes a
100 TB corpus searchable without scanning it.

Exact-integer throughout (the ivf_exact/nndescent_exact recipe): ppm
vectors, BIGINT d² scores (order-free), (d2 ASC, vec ASC) tie-breaks,
entry points = the `beam` smallest vec_ids (the shared no-RNG seed
convention), and a FIXED hop count — so the entire search, INCLUDING
the graph construction it runs on, unrolls as MATERIALIZED CTE stages
in DuckDB (`graph_ann_oracle_sql` appends per-hop stages to
`nndescent_exact._unroll_parts`) and replays bit-for-bit.

Scale shape: graph edges are n·k ids (never vectors); the per-hop
frontier is |Q|·beam rows; neighbor expansion is an equi-join on the
edge source; scoring pulls vectors to ≤ |Q|·beam·(k+1) candidates per
hop via an equi-join (the corpus never cross-joins); top-beam is a
per-query window over bounded candidates. Query vectors ride the
frontier rows (|Q| is the small side, broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_application_spark.operators.kmeans_exact import quantize_ppm
from flink_application_spark.operators.nndescent_exact import (
    _unroll_parts,
    nn_descent_exact,
)

__all__ = [
    "graph_ann_search_topk",
    "graph_ann_routed_search_topk",
    "exact_topk_int",
    "graph_ann_oracle_sql",
    "graph_ann_routed_oracle_sql",
]

_D2 = (
    "aggregate(zip_with(e, qv, (a, b) -> (a - b) * (a - b)),"
    " 0L, (acc, x) -> acc + x)"
)


def graph_ann_search_topk(
    emb: DataFrame,
    k: int = 6,
    *,
    beam: int = 8,
    hops: int = 3,
    n_queries: int = 5,
    graph_k: int = 6,
    graph_iters: int = 3,
    graph: DataFrame | None = None,
) -> DataFrame:
    """(query_id, vec_id, d2q, rank): top-k of the final beam after
    `hops` greedy expansions over the exact NN-Descent graph, for the
    first `n_queries` vec_ids (self excluded). k ≤ beam — the beam IS
    the candidate pool the answer comes from."""
    if k > beam:
        raise ValueError(f"k ({k}) must be <= beam ({beam})")
    q = quantize_ppm(emb).persist()
    if graph is None:
        graph = nn_descent_exact(emb, k=graph_k, n_iter=graph_iters)
    edges = graph.select(F.col("vec_id").alias("src"), F.col("nbr_id").alias("dst"))
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qv")
    )
    # entry points: the `beam` smallest vec_ids (no-RNG convention),
    # shipped as a bounded literal array — no join, no NLJ
    ent = [r["vec_id"] for r in q.orderBy("vec_id").limit(beam).collect()]
    frontier = queries.select(
        "query_id",
        "qv",
        F.explode(F.array(*[F.lit(int(v)) for v in ent])).alias("vec_id"),
    )
    beam_df = _hop_search(q, edges, frontier, beam=beam, hops=hops)
    q.unpersist()
    return beam_df.filter(F.col("rank") <= k).select(
        "query_id", "vec_id", "d2q", "rank"
    )


def _hop_search(
    q: DataFrame, edges: DataFrame, frontier: DataFrame, *, beam: int, hops: int
) -> DataFrame:
    """The shared greedy-expansion kernel: score the frontier, then
    `hops` rounds of expand-out-neighbors / score / keep-top-beam.
    Self always excluded from scoring."""

    def _score_topb(cand: DataFrame) -> DataFrame:
        scored = (
            cand.filter(F.col("vec_id") != F.col("query_id"))
            .join(q, "vec_id")
            .select("query_id", "qv", "vec_id", F.expr(_D2).alias("d2q"))
        )
        w = Window.partitionBy("query_id").orderBy(
            F.col("d2q").asc(), F.col("vec_id").asc()
        )
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= beam)
            .select("query_id", "qv", "vec_id", "d2q", "rank")
        )

    beam_df = _score_topb(frontier).localCheckpoint()
    for _ in range(hops):
        nbrs = (
            beam_df.join(edges, beam_df["vec_id"] == edges["src"])
            .select("query_id", "qv", F.col("dst").alias("vec_id"))
        )
        cand = (
            beam_df.select("query_id", "qv", "vec_id")
            .unionByName(nbrs)
            .dropDuplicates(["query_id", "vec_id"])
        )
        beam_df = _score_topb(cand).localCheckpoint()
    return beam_df


def graph_ann_routed_search_topk(
    emb: DataFrame,
    cents: list[list[int]],
    k: int = 6,
    *,
    beam: int = 8,
    hops: int = 3,
    n_queries: int = 5,
    graph: DataFrame,
) -> DataFrame:
    """IVF-ROUTED entry points (round-10 verdict item 5 — the
    HNSW-upper-layer role played by the exact k-means centroids): the
    fixed smallest-vec_id entry set costs extra hops on a 100× corpus
    (layer-0-only GNNS); here each query routes to its nearest trained
    centroid (the same exact-integer argmin the IVF index uses, ties →
    cluster ascending) and enters the graph at that cluster's `beam`
    CENTROID-CLOSEST members — per-cluster entry lists are
    query-independent, precomputable, and O(k_centroids·beam) ids.
    Search then proceeds exactly as `graph_ann_search_topk`.

    `cents` are trained ppm centroids (`kmeans_fit_exact`); at scale
    they come from the session memo so the fit is shared with the IVF
    queries. Returns (query_id, vec_id, d2q, rank) — bit-replayable by
    `graph_ann_routed_oracle_sql`."""
    from flink_application_spark.operators.kmeans_exact import _assign_expr

    if k > beam:
        raise ValueError(f"k ({k}) must be <= beam ({beam})")
    q = quantize_ppm(emb).persist()
    edges = graph.select(F.col("vec_id").alias("src"), F.col("nbr_id").alias("dst"))
    assigned = q.select(
        "vec_id", "e", F.expr(_assign_expr(cents)).alias("b")
    ).select(
        "vec_id",
        "e",
        F.col("b.d2").alias("d2c"),
        F.col("b.cluster").alias("cluster"),
    )
    w_ent = Window.partitionBy("cluster").orderBy(
        F.col("d2c").asc(), F.col("vec_id").asc()
    )
    entries = (
        assigned.withColumn("rnk", F.row_number().over(w_ent))
        .filter(F.col("rnk") <= beam)
        .select("cluster", "vec_id")
    )
    queries = assigned.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qv"), "cluster"
    )
    # the entry table is k_centroids·beam ids — always the broadcast side
    frontier = queries.join(F.broadcast(entries), "cluster").select(
        "query_id", "qv", "vec_id"
    )
    beam_df = _hop_search(q, edges, frontier, beam=beam, hops=hops)
    q.unpersist()
    return beam_df.filter(F.col("rank") <= k).select(
        "query_id", "vec_id", "d2q", "rank"
    )


def exact_topk_int(
    emb: DataFrame, k: int = 6, *, n_queries: int = 5
) -> DataFrame:
    """Exact integer top-k for the first `n_queries` vec_ids — the
    LINEAR-scan baseline graph search is measured against (n_queries·n
    scoring pairs, corpus-side scan-local; unlike knn_graph_exact_int
    this is never quadratic). (query_id, vec_id, d2q, rank)."""
    q = quantize_ppm(emb)
    queries = F.broadcast(
        q.filter(F.col("vec_id") < n_queries).select(
            F.col("vec_id").alias("query_id"), F.col("e").alias("qv")
        )
    )
    scored = (
        q.join(queries, q["vec_id"] != queries["query_id"])
        .select("query_id", "vec_id", F.expr(_D2).alias("d2q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("d2q").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "d2q", "rank")
    )


def graph_ann_oracle_sql(
    mode: str = "topk",
    k: int = 6,
    *,
    beam: int = 8,
    hops: int = 3,
    n_queries: int = 5,
    graph_k: int = 6,
    graph_iters: int = 3,
) -> str:
    """DuckDB replay: the full NN-Descent unroll (shared stages,
    byte-identical to the graph oracle), then entry-point seeding and
    one scored-top-beam stage per hop.

    mode='topk'   → the search result (query_id, vec_id, d2q, rank);
    mode='recall' → one row per query (query_id, hits, recall_ppm)
                    against the linear exact scan — the published
                    per-query honesty readout."""
    parts = _unroll_parts(graph_k, graph_iters, graph_k)
    T = graph_iters
    d2 = (
        "CAST(list_sum(list_transform(list_zip(c.e, s.qv),"
        " z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    )
    parts.append(
        f"""qs AS MATERIALIZED (
  SELECT vec_id AS query_id, e AS qv FROM q WHERE vec_id < {n_queries}
)"""
    )
    parts.append(
        f"""ent AS MATERIALIZED (
  SELECT vec_id FROM q ORDER BY vec_id LIMIT {beam}
)"""
    )
    # hop stages: score candidates, keep top-beam per query
    prev = None
    for t in range(hops + 1):
        cand = (
            f"SELECT s.query_id, s.qv, ent.vec_id FROM qs s CROSS JOIN ent"
            if t == 0
            else f"""SELECT query_id, qv, vec_id FROM sb{t - 1}
    UNION
    SELECT b.query_id, b.qv, g.dst AS vec_id
    FROM sb{t - 1} b JOIN g{T} g ON g.src = b.vec_id"""
        )
        parts.append(
            f"""sb{t} AS MATERIALIZED (
  SELECT query_id, qv, vec_id, d2q, rank FROM (
    SELECT s.query_id, s.qv, s.vec_id, {d2} AS d2q,
           row_number() OVER (
             PARTITION BY s.query_id
             ORDER BY {d2} ASC, s.vec_id ASC
           ) AS rank
    FROM (SELECT DISTINCT query_id, qv, vec_id FROM ({cand})) s
    JOIN q c ON c.vec_id = s.vec_id
    WHERE s.vec_id <> s.query_id
  ) WHERE rank <= {beam}
)"""
        )
        prev = f"sb{t}"
    body = ",\n".join(parts)
    if mode == "topk":
        return (
            f"WITH {body}\n"
            f"SELECT query_id, vec_id, d2q, CAST(rank AS INT) AS rank "
            f"FROM {prev} WHERE rank <= {k}"
        )
    assert mode == "recall"
    return _recall_tail(body, prev, d2, k)


def graph_ann_routed_oracle_sql(
    k: int = 6,
    *,
    beam: int = 8,
    hops: int = 3,
    n_queries: int = 5,
    graph_k: int = 6,
    graph_iters: int = 3,
    km_k: int = 8,
    km_iters: int = 5,
    dim: int = 64,
) -> str:
    """DuckDB replay of the IVF-routed entry search: the NN-Descent
    unroll (the graph), the PREFIXED exact-k-means unroll (the
    router), one final-assignment stage against the trained centroids
    (the same d2·k+cluster aggregate argmin as the training rounds),
    the per-cluster entry lists, then the standard per-hop beam
    stages seeded from the query's own cluster's entries."""
    from flink_application_spark.operators.kmeans_exact import (
        kmeans_exact_cte_parts_prefixed,
    )

    parts = _unroll_parts(graph_k, graph_iters, graph_k)
    parts.extend(
        kmeans_exact_cte_parts_prefixed(
            km_k,
            km_iters,
            dim,
            prefix="r",
            q_sql="rq AS MATERIALIZED (SELECT vec_id, e FROM q)",
        )
    )
    T, KT = graph_iters, km_iters
    d2c = (
        "list_sum(list_transform(list_zip(q.e, c.cv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    parts.append(
        f"""fa AS MATERIALIZED (
  SELECT vec_id, e, best % {km_k} AS cluster, best // {km_k} AS d2c FROM (
    SELECT q.vec_id, any_value(q.e) AS e,
           min({d2c} * {km_k} + c.cluster) AS best
    FROM q CROSS JOIN rc{KT} c
    GROUP BY q.vec_id
  )
)"""
    )
    parts.append(
        f"""rent AS MATERIALIZED (
  SELECT cluster, vec_id FROM (
    SELECT cluster, vec_id,
           row_number() OVER (
             PARTITION BY cluster ORDER BY d2c ASC, vec_id ASC
           ) AS rnk
    FROM fa
  ) WHERE rnk <= {beam}
)"""
    )
    parts.append(
        f"""rqs AS MATERIALIZED (
  SELECT vec_id AS query_id, e AS qv, cluster FROM fa WHERE vec_id < {n_queries}
)"""
    )
    d2 = (
        "CAST(list_sum(list_transform(list_zip(c.e, s.qv),"
        " z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    )
    prev = None
    for t in range(hops + 1):
        cand = (
            "SELECT s.query_id, s.qv, rent.vec_id"
            " FROM rqs s JOIN rent ON rent.cluster = s.cluster"
            if t == 0
            else f"""SELECT query_id, qv, vec_id FROM rsb{t - 1}
    UNION
    SELECT b.query_id, b.qv, g.dst AS vec_id
    FROM rsb{t - 1} b JOIN g{T} g ON g.src = b.vec_id"""
        )
        parts.append(
            f"""rsb{t} AS MATERIALIZED (
  SELECT query_id, qv, vec_id, d2q, rank FROM (
    SELECT s.query_id, s.qv, s.vec_id, {d2} AS d2q,
           row_number() OVER (
             PARTITION BY s.query_id
             ORDER BY {d2} ASC, s.vec_id ASC
           ) AS rank
    FROM (SELECT DISTINCT query_id, qv, vec_id FROM ({cand})) s
    JOIN q c ON c.vec_id = s.vec_id
    WHERE s.vec_id <> s.query_id
  ) WHERE rank <= {beam}
)"""
        )
        prev = f"rsb{t}"
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT query_id, vec_id, d2q, CAST(rank AS INT) AS rank "
        f"FROM {prev} WHERE rank <= {k}"
    )


def _recall_tail(body: str, prev: str, d2: str, k: int) -> str:
    """The recall-mode oracle tail (exact linear scan + hit join) —
    shared text, split out so the routed oracle could be added above
    without duplicating it."""
    return f"""WITH {body},
exact AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT s.query_id, c.vec_id,
           row_number() OVER (
             PARTITION BY s.query_id ORDER BY {d2} ASC, c.vec_id ASC
           ) AS rank
    FROM qs s JOIN q c ON c.vec_id <> s.query_id
  ) WHERE rank <= {k}
),
got AS (SELECT query_id, vec_id FROM {prev} WHERE rank <= {k})
SELECT e.query_id,
       CAST(count(g.vec_id) AS BIGINT) AS hits,
       CAST(count(g.vec_id) AS BIGINT) * 1000000 // {k} AS recall_ppm
FROM exact e
LEFT JOIN got g ON g.query_id = e.query_id AND g.vec_id = e.vec_id
GROUP BY e.query_id"""
