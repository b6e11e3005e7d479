"""PageRank over a similarity/interaction graph.

Where `operators/components.py` answers "which docs form one
duplicate cluster", PageRank answers "which doc is the CENTER of its
neighborhood" — a principled canonical-representative / importance
signal on the near-dup graph (the most-connected variant of a
boilerplate family), and the standard importance measure on any
edge list.

The iterative-Spark shape, same discipline as connected components:

    rank ← 1/N
    repeat: contrib = rank/out_deg shipped along edges;
            rank' = (1−d)/N + d·(Σ contribs + dangling_mass/N)

- each round: one join (ranks × edges, shuffle on vertex id) + one
  sum-aggregate — edge-linear, no adjacency matrix materialized;
- dangling mass (vertices with no out-edges) is a driver-side scalar
  per round (tiny job), redistributed uniformly — keeps Σ rank = 1
  exactly, which the tests pin;
- `localCheckpoint` per round truncates lineage (plan-size OOM guard);
- rounds are bounded (`iters`), not convergence-polled: PageRank's
  geometric contraction makes a fixed ~15 rounds the production norm.

At 100 TB-scale graphs the per-round shuffle is O(edges) rank-sized
rows; the only driver state is two scalars per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Vertex-count ceiling for broadcasting the per-round inflow aggregate
# (≤ n rows of (id, double) ≈ 24 B/row → ~50 MB at the cap) as the
# BUILD side of pagerank's left-outer rebase join. Above it the rebase
# stays a shuffle join (the 100 TB shape).
BROADCAST_VERTS_MAX = 2_000_000


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iters: int = 15,
    undirected: bool = True,
) -> DataFrame:
    """(id, rank) with Σ rank = 1 over the vertices present in `edges`.

    `undirected=True` (the similarity-graph case) mirrors every edge
    so rank flows both ways."""
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if undirected:
        e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    e = e.distinct().persist()

    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .persist()
    )
    n = verts.count()
    if n == 0:
        # no edges → no vertices: empty (id, rank), not a ZeroDivision
        e.unpersist()
        verts.unpersist()
        return verts.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    # out-degree is ROUND-INVARIANT: join it to the vertex set once and
    # carry `deg` on the rank frame, instead of re-joining out_deg
    # inside every round (one join × iters removed — guide §2.4); the
    # dangling filter then needs no join at all.
    vdeg = verts.join(out_deg, "id", "left").persist()
    vdeg.count()
    # the per-round rebase join is LEFT OUTER with vdeg preserved, so
    # the only buildable side is the right one — the per-round inflow
    # aggregate (≤ n rows of (id, double)). Broadcast THAT when the
    # vertex count (already collected) is bounded; a 100× corpus takes
    # the shuffle path unchanged. (Round-11 ADVICE: the old
    # F.broadcast(vdeg) hinted the preserved side, which Spark cannot
    # BuildLeft for LeftOuter — the hint was silently ignored and
    # every round ran the shuffle join anyway.)
    bcast_inflow = n <= BROADCAST_VERTS_MAX

    ranks = vdeg.select("id", "deg").withColumn("rank", F.lit(1.0 / n))
    for it in range(iters):
        # dangling vertices (no out-edges) leak their mass; collect it
        # as a scalar and hand it back uniformly. Undirected graphs
        # can't have dangling vertices (mirroring makes every vertex a
        # src), so the per-round driver collect — one extra Spark job
        # per iteration, half the wall time on small graphs — is
        # skipped there; dangling = 0.0 makes `base` arithmetically
        # identical to the collected form.
        if undirected:
            dangling = 0.0
        else:
            dangling = (
                ranks.filter(F.col("deg").isNull())
                .agg(F.sum("rank"))
                .collect()[0][0]
                or 0.0
            )
        contribs = (
            ranks.filter(F.col("deg").isNotNull())
            .join(e, ranks["id"] == e["src"])
            .select(F.col("dst").alias("id"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("inflow"))
        )
        base = (1.0 - damping) / n + damping * dangling / n
        ranks = vdeg.join(
            F.broadcast(contribs) if bcast_inflow else contribs, "id", "left"
        ).select(
            "id",
            "deg",
            (
                F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("rank"),
        )
        # lineage truncation every 3rd round (and on the last) instead
        # of every round: the plan stays bounded while 2/3 of the
        # materialization jobs disappear (deeper gaps measured SLOWER —
        # Catalyst time on 5-round plans outgrew the saved jobs). The
        # directed path needs the per-round dangling collect anyway,
        # so it checkpoints every round to keep that collect cheap.
        if (not undirected) or it % 3 == 2 or it == iters - 1:
            ranks = ranks.localCheckpoint()
    # localCheckpoint materialized the final ranks; the loop inputs can
    # release their storage (long-lived sessions run this repeatedly)
    e.unpersist()
    verts.unpersist()
    vdeg.unpersist()
    return ranks.select("id", "rank")
