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

__all__ = ["graph_ann_search_topk", "exact_topk_int", "graph_ann_oracle_sql"]

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
