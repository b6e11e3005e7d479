"""Connected components via iterative min-label propagation.

Near-duplicate detection yields PAIRS; deduplication needs GROUPS —
the connected components of the similarity graph (a pair chain
a~b, b~c must collapse to one cluster even though a,c were never
compared). The reference has no iterative operator at all; this is the
canonical "iterative algorithm on Spark" shape:

    labels ← vertex ids
    repeat: every vertex takes min(own label, neighbors' labels)
    until no label changes

Each round is one join (labels × edges) + one min-aggregate — all
DataFrame ops, shuffling on vertex id every round. Plain neighbor-min
propagation converges in O(graph diameter) rounds, which is fine for
near-clique dedup clusters but NOT for chain-shaped components
(a~b~c~...~z): the sf0.1 embedding near-dup graph produced a chain
longer than 25 hops and the loop hit max_iter. So each round also
performs one **pointer-jumping** step — label(v) ← min(label(v),
label(label(v))) via a self-join of the labels table on label — which
collapses chains geometrically and bounds the loop at O(log diameter)
rounds (Shiloach–Vishkin shortcutting; same round-compression idea as
the large-star/small-star MapReduce algorithm of Kiveris et al.).
Correctness invariant: label(v) is always the id of SOME vertex in
v's component (neighbor labels are reachable; label-of-label is
reachable transitively), labels only decrease, and the component min
is a fixed point — so the loop converges exactly to min-reachable-id.
Two things make the loop cluster-safe:

- `localCheckpoint` each round truncates lineage — without it the plan
  doubles per iteration and the driver OOMs on plan size around round
  ~30 (classic iterative-Spark failure).
- the convergence test (`changed == 0`) is a driver-side count per
  round — one tiny job, not a collect of data.

For web-scale graphs (billions of edges, high diameter) the
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce and Beyond") halves round count; dedup graphs don't need
it and the simple loop has half the shuffle volume per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    src: str = "src",
    dst: str = "dst",
    vertex_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """(vertex, component) where component = min vertex id reachable.

    `edges` is undirected (each pair listed once, either orientation).
    `vertices` optionally supplies isolated vertices (own component);
    defaults to the vertices present in `edges`.
    """
    both = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    both = both.localCheckpoint(eager=True)

    if vertices is None:
        labels = both.select(F.col("a").alias("v")).distinct()
    else:
        labels = vertices.select(F.col(vertex_col).alias("v")).distinct()
    labels = labels.withColumn("label", F.col("v"))

    for _ in range(max_iter):
        # neighbor minimum: for each edge a→b, b's label is a candidate
        # for a; take min(own, candidates)
        cand = (
            both.join(labels, both.b == labels.v)
            .select(F.col("a").alias("v"), F.col("label"))
        )
        propagated = (
            labels.select("v", "label")
            .union(cand)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: label(v) ← min(label(v), label(label(v))).
        # Collapses label chains geometrically so chain-shaped
        # components converge in O(log diameter) rounds, not O(diameter).
        jump = propagated.select(
            F.col("v").alias("jv"), F.col("label").alias("jlabel")
        )
        new_labels = (
            propagated.join(jump, propagated.label == jump.jv, "left")
            .select(
                "v",
                F.least(
                    F.col("label"), F.coalesce(F.col("jlabel"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.v") == F.col("o.v"))
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("v"), F.col("label").alias("component"))
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
