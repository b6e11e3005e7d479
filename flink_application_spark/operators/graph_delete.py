"""kNN-graph DELETION with local repair — the fourth leg of the graph
lifecycle (round-10; NN-Descent BUILDS, beam search SERVES,
`graph_insert` GROWS, this module SHRINKS without rebuild).

The procedure is the practical dynamic-graph deletion (the
hnswlib/FAISS mark-deleted discipline plus the repair pass dynamic
HNSW deployments run): drop every adjacency row whose source OR
destination is deleted, then REPAIR the vertices that lost neighbors
— each affected vertex beam-searches the PRUNED graph for replacement
candidates (the same greedy search the serving path runs, self and
deleted ids excluded) and its adjacency re-fills to top-k from
(surviving edges ∪ beam candidates). Unaffected vertices keep their
edges (their re-rank is the identity). Repair restores OUT-degree;
the BACK-LINK half (round-10 verdict item 4, on by default) then
restores IN-degree: each repaired vertex proposes itself to its
post-repair neighbors (one reversed equi-join — d² is symmetric, no
re-scoring) and those neighbors' lists re-prune to top-k, the same
shrink step the insert path runs. Vertices receiving no proposal
keep their exact rows. With ``backlink=False`` the classic
out-degree-only local repair remains available.

Exact-integer throughout (the shared recipe): ppm vectors, BIGINT d²,
(d2 ASC, id ASC) ties, entry points = the `beam` smallest SURVIVING
vec_ids, fixed hop count — so prune + repair-search + re-fill unroll
as MATERIALIZED CTE stages over the shared NN-Descent unroll
(`graph_delete_oracle_sql`) and replay bit-for-bit.

Scale shape: the affected set is ≤ |D|·k in-neighbors (ids-only
anti-joins find it); the repair beam touches |A|·beam·(k+1)
candidates per hop via equi-joins; the final re-fill is one window
over (surviving ∪ candidate) edges — the corpus is never scanned, and
the untouched part of the graph never shuffles vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from flink_application_spark.operators.graph_insert import _beam_topb, _prune_topk
from flink_application_spark.operators.kmeans_exact import quantize_ppm
from flink_application_spark.operators.nndescent_exact import (
    _unroll_parts,
    nn_descent_exact,
)

__all__ = ["graph_delete_batch", "graph_delete_largest", "graph_delete_oracle_sql"]


def graph_delete_batch(
    graph: DataFrame,
    coords: DataFrame,
    delete_ids: list[int],
    *,
    k: int,
    beam: int,
    hops: int,
    entry_ids: list[int],
    backlink: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Remove `delete_ids` from the graph and locally repair.

    graph:  current edges (src, dst, d2, rank); coords: (vec_id, e)
    ppm coordinates of every current vertex. Returns (updated graph,
    updated coords) — unpersisted plans, callers checkpoint."""
    dels = [int(i) for i in delete_ids]
    survivors = graph.filter(
        ~F.col("src").isin(dels) & ~F.col("dst").isin(dels)
    ).select("src", "dst", "d2")
    coords_new = coords.filter(~F.col("vec_id").isin(dels))
    # affected = vertices that LOST an out-edge (had dst in D)
    affected = (
        graph.filter(F.col("dst").isin(dels) & ~F.col("src").isin(dels))
        .select(F.col("src").alias("vec_id"))
        .distinct()
    )
    queries = affected.join(coords_new, "vec_id").select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qv")
    )
    frontier = queries.select(
        "query_id",
        "qv",
        F.explode(F.array(*[F.lit(int(v)) for v in entry_ids])).alias("vec_id"),
    )
    # repair beam search over the PRUNED graph; coords_new excludes D,
    # so deleted vertices can never score as candidates. The affected
    # vertex itself CAN appear on the frontier — exclude self before
    # scoring (unlike insert, repair queries are existing vertices).
    def _no_self(cand: DataFrame) -> DataFrame:
        return cand.filter(F.col("vec_id") != F.col("query_id"))

    beam_df = _beam_topb(_no_self(frontier), coords_new, beam)
    edge_src = survivors.select("src", "dst")
    for _ in range(hops):
        nbrs = beam_df.join(
            edge_src, beam_df["vec_id"] == edge_src["src"]
        ).select("query_id", "qv", F.col("dst").alias("vec_id"))
        cand = (
            beam_df.select("query_id", "qv", "vec_id")
            .unionByName(nbrs)
            .dropDuplicates(["query_id", "vec_id"])
        )
        beam_df = _beam_topb(_no_self(cand), coords_new, beam)
    repair = beam_df.select(
        F.col("query_id").alias("src"), F.col("vec_id").alias("dst"),
        F.col("d2q").alias("d2"),
    )
    # re-fill: survivors ∪ repair candidates, deduped (a beam result
    # may duplicate a surviving edge), top-k per src
    updated = _prune_topk(
        survivors.unionByName(repair).dropDuplicates(["src", "dst"]), k
    )
    if backlink:
        # back-link half: every repaired vertex proposes itself to its
        # post-repair out-neighbors (reversed edges — d² is symmetric,
        # so the proposal reuses the stored distance); the receiving
        # lists re-prune to top-k. One equi-join + the shared window.
        props = (
            updated.select("src", "dst", "d2")
            .join(
                affected.select(F.col("vec_id").alias("src")),
                "src",
                "left_semi",
            )
            .select(
                F.col("dst").alias("src"), F.col("src").alias("dst"), "d2"
            )
        )
        updated = _prune_topk(
            updated.select("src", "dst", "d2")
            .unionByName(props)
            .dropDuplicates(["src", "dst"]),
            k,
        )
    return updated, coords_new


def graph_delete_largest(
    emb: DataFrame,
    *,
    k: int = 6,
    beam: int = 8,
    hops: int = 2,
    n_delete: int = 4,
    graph_iters: int = 3,
    base_graph: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    backlink: bool = True,
) -> DataFrame:
    """End-to-end demonstration: NN-Descent-build the full-corpus
    graph (or take `base_graph` over exactly that corpus — the session
    memo path), then delete the corpus's `n_delete` LARGEST vec_ids
    and repair. Returns the repaired graph (vec_id, nbr_id, d2, rank)
    — bit-replayable by `graph_delete_oracle_sql`."""
    q = quantize_ppm(emb, id_col, vec_col).persist()
    dels = sorted(
        r["vec_id"]
        for r in q.orderBy(F.col("vec_id").desc()).limit(n_delete).collect()
    )
    if base_graph is None:
        base_graph = nn_descent_exact(
            emb.filter(F.col(vec_col).isNotNull()),
            k=k,
            n_iter=graph_iters,
            id_col=id_col,
            vec_col=vec_col,
        )
    graph = base_graph.select(
        F.col(id_col).alias("src"), F.col("nbr_id").alias("dst"), "d2", "rank"
    ).localCheckpoint()
    # NOTE (round 12): unlike graph_insert_waves, this checkpoint must
    # stay — the returned repair plan is lazy and q unpersists before
    # the caller materializes it, so coords must hold its own blocks
    coords = q.select("vec_id", "e").localCheckpoint()
    entry_ids = [
        r["vec_id"]
        for r in q.filter(~F.col("vec_id").isin([int(i) for i in dels]))
        .orderBy("vec_id")
        .limit(beam)
        .collect()
    ]
    updated, _ = graph_delete_batch(
        graph, coords, dels, k=k, beam=beam, hops=hops, entry_ids=entry_ids,
        backlink=backlink,
    )
    q.unpersist()
    return updated.select(
        F.col("src").alias(id_col), F.col("dst").alias("nbr_id"), "d2", "rank"
    )


# --------------------------------------------------------------------
# DuckDB replay


def graph_delete_oracle_sql(
    mode: str = "graph",
    k: int = 6,
    *,
    beam: int = 8,
    hops: int = 2,
    n_delete: int = 4,
    graph_iters: int = 3,
    search_k: int = 6,
    search_beam: int = 8,
    search_hops: int = 3,
    n_queries: int = 5,
    backlink: bool = True,
) -> str:
    """Full replay: the NN-Descent unroll over the WHOLE corpus, the
    prune, one repair beam chain for all affected vertices, the
    re-fill, the back-link re-prune (``backlink=True``, the operator
    default — one more CTE stage) — then optionally the serving
    search over the repaired graph.

    mode='graph'  → the repaired adjacency (vec_id, nbr_id, d2, rank);
    mode='search' → beam search for the first `n_queries` vec_ids over
                    the repaired graph (query_id, vec_id, d2q, rank) —
                    deleted vertices can never be returned."""
    parts = _unroll_parts(k, graph_iters, k)
    T = graph_iters
    d2q = (
        "CAST(list_sum(list_transform(list_zip(c.e, s.qv),"
        " z -> (z[1] - z[2]) * (z[1] - z[2]))) AS BIGINT)"
    )
    parts.append(
        f"""dels AS MATERIALIZED (
  SELECT vec_id FROM q ORDER BY vec_id DESC LIMIT {n_delete}
)"""
    )
    parts.append(
        """qd AS MATERIALIZED (
  SELECT vec_id, e FROM q ANTI JOIN dels USING (vec_id)
)"""
    )
    parts.append(
        f"""surv AS MATERIALIZED (
  SELECT src, dst, d2 FROM g{T}
  WHERE src NOT IN (SELECT vec_id FROM dels)
    AND dst NOT IN (SELECT vec_id FROM dels)
)"""
    )
    parts.append(
        f"""aff AS MATERIALIZED (
  SELECT DISTINCT src AS query_id FROM g{T}
  WHERE dst IN (SELECT vec_id FROM dels)
    AND src NOT IN (SELECT vec_id FROM dels)
)"""
    )
    parts.append(
        """affq AS MATERIALIZED (
  SELECT a.query_id, c.e AS qv FROM aff a JOIN qd c ON c.vec_id = a.query_id
)"""
    )
    parts.append(
        f"ent AS MATERIALIZED (SELECT vec_id FROM qd ORDER BY vec_id LIMIT {beam})"
    )
    prev_b = None
    for t in range(hops + 1):
        cand = (
            "SELECT s.query_id, s.qv, ent.vec_id FROM affq s CROSS JOIN ent"
            if t == 0
            else f"""SELECT query_id, qv, vec_id FROM rb{t - 1}
    UNION
    SELECT b.query_id, b.qv, g.dst AS vec_id
    FROM rb{t - 1} b JOIN surv g ON g.src = b.vec_id"""
        )
        parts.append(
            f"""rb{t} AS MATERIALIZED (
  SELECT query_id, qv, vec_id, d2q, rank FROM (
    SELECT s.query_id, s.qv, s.vec_id, {d2q} AS d2q,
           row_number() OVER (
             PARTITION BY s.query_id
             ORDER BY {d2q} ASC, s.vec_id ASC
           ) AS rank
    FROM (SELECT DISTINCT query_id, qv, vec_id FROM ({cand})) s
    JOIN qd c ON c.vec_id = s.vec_id
    WHERE s.vec_id <> s.query_id
  ) WHERE rank <= {beam}
)"""
        )
        prev_b = f"rb{t}"
    parts.append(
        f"""gdel AS MATERIALIZED (
  SELECT src, dst, d2, rank FROM (
    SELECT src, dst, d2,
           row_number() OVER (PARTITION BY src ORDER BY d2 ASC, dst ASC)
             AS rank
    FROM (SELECT DISTINCT src, dst, d2 FROM (
            SELECT src, dst, d2 FROM surv
            UNION ALL
            SELECT query_id AS src, vec_id AS dst, d2q AS d2 FROM {prev_b}))
  ) WHERE rank <= {k}
)"""
    )
    final_g = "gdel"
    if backlink:
        # the back-link re-prune: repaired vertices' post-repair edges,
        # reversed, proposed to their dst lists (d² symmetric), then
        # the shared top-k shrink — DISTINCT on (src, dst, d2) dedups
        # proposals that duplicate existing edges (equal exact d²)
        parts.append(
            f"""gbl AS MATERIALIZED (
  SELECT src, dst, d2, rank FROM (
    SELECT src, dst, d2,
           row_number() OVER (PARTITION BY src ORDER BY d2 ASC, dst ASC)
             AS rank
    FROM (SELECT DISTINCT src, dst, d2 FROM (
            SELECT src, dst, d2 FROM gdel
            UNION ALL
            SELECT g.dst AS src, g.src AS dst, g.d2
            FROM gdel g SEMI JOIN aff a ON a.query_id = g.src))
  ) WHERE rank <= {k}
)"""
        )
        final_g = "gbl"
    if mode == "graph":
        body = ",\n".join(parts)
        return (
            f"WITH {body}\n"
            f"SELECT src AS vec_id, dst AS nbr_id, d2,"
            f" CAST(rank AS INT) AS rank FROM {final_g}"
        )
    assert mode == "search"
    parts.append(
        f"""qs AS MATERIALIZED (
  SELECT vec_id AS query_id, e AS qv FROM qd WHERE vec_id < {n_queries}
)"""
    )
    parts.append(
        "sent AS MATERIALIZED"
        f" (SELECT vec_id FROM qd ORDER BY vec_id LIMIT {search_beam})"
    )
    prev_s = None
    for t in range(search_hops + 1):
        cand = (
            "SELECT s.query_id, s.qv, sent.vec_id FROM qs s CROSS JOIN sent"
            if t == 0
            else f"""SELECT query_id, qv, vec_id FROM sb{t - 1}
    UNION
    SELECT b.query_id, b.qv, g.dst AS vec_id
    FROM sb{t - 1} b JOIN {final_g} g ON g.src = b.vec_id"""
        )
        parts.append(
            f"""sb{t} AS MATERIALIZED (
  SELECT query_id, qv, vec_id, d2q, rank FROM (
    SELECT s.query_id, s.qv, s.vec_id, {d2q} AS d2q,
           row_number() OVER (
             PARTITION BY s.query_id
             ORDER BY {d2q} ASC, s.vec_id ASC
           ) AS rank
    FROM (SELECT DISTINCT query_id, qv, vec_id FROM ({cand})) s
    JOIN qd c ON c.vec_id = s.vec_id
    WHERE s.vec_id <> s.query_id
  ) WHERE rank <= {search_beam}
)"""
        )
        prev_s = f"sb{t}"
    body = ",\n".join(parts)
    return (
        f"WITH {body}\n"
        f"SELECT query_id, vec_id, d2q, CAST(rank AS INT) AS rank "
        f"FROM {prev_s} WHERE rank <= {search_k}"
    )
