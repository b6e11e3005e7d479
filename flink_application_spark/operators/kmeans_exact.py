"""Exact-integer (ppm-quantized) Lloyd's k-means — the oracle-
replayable TRAINING loop.

`operators/kmeans.kmeans_fit` is rows-only by necessity: its centroid
updates are float means whose cross-partition summation order is
engine-dependent. This variant removes the float reductions entirely —
the round-7 determinism recipe applied to distributed training:

- inputs quantize ONCE to ppm integers (CAST(round(v·1e6) AS BIGINT));
- distances are exact BIGINT folds (Σ (aᵢ−cᵢ)², coords ≤ ~1e6 →
  64·(2e6)² ≈ 2.6e14 ≪ 2⁶³), so argmin assignment (ties → cluster
  ascending) is bit-deterministic under ANY partitioning or reduction
  order;
- centroid updates reduce exact integer coordinate SUMS (associative —
  order-free), divide once in IEEE double (identical both engines),
  and re-quantize to ppm via one round() — centroids stay integers, so
  the next iteration is again exact;
- empty clusters keep their previous centroid (deterministic rule,
  mirrored in the oracle).

The per-iteration profile (inertia = Σ min-d², centroid L1 mass after
the update — both exact BIGINTs) pins the ENTIRE training trajectory
in the driver's value hash: the DuckDB oracle unrolls the `iters`
Lloyd's rounds as CTE stages (`kmeans_exact_oracle_sql`) and must
reproduce every number bit-for-bit. Quantization costs ~1e-6 relative
coordinate error versus the float trainer — irrelevant next to
k-means' own local-optimum variance — and buys a verifiable trainer;
the float path (`kmeans_fit` / `kmeans_fit_local`) remains for parity
with conventional pipelines.

Scale shape: identical to the float trainer — one broadcast-literal
assignment pass plus one posexplode partial-agg reduction per
iteration; driver state is k·d integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

SCALE = 1_000_000


def quantize_ppm(
    emb: DataFrame, id_col: str = "vec_id", col: str = "embedding"
) -> DataFrame:
    """(id, e) with e = the embedding as ppm BIGINTs."""
    return emb.filter(F.col(col).isNotNull()).select(
        F.col(id_col).alias("vec_id"),
        F.expr(
            f"transform({col}, v -> CAST(round(CAST(v AS DOUBLE) * {SCALE})"
            " AS BIGINT))"
        ).alias("e"),
    )


def _assign_expr(cents: list[list[int]]) -> str:
    """SQL picking (d2, cluster) of the nearest centroid — one exact
    integer fold per centroid, array_sort tie-break on cluster asc."""
    structs = ", ".join(
        "named_struct('d2', aggregate(zip_with(e, array("
        + ", ".join(f"{int(c)}L" for c in cv)
        + "), (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x), "
        f"'cluster', {i})"
        for i, cv in enumerate(cents)
    )
    return f"element_at(array_sort(array({structs})), 1)"


def kmeans_fit_exact(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> tuple[list[list[int]], list[tuple[int, int, int]]]:
    """Run `iters` exact-integer Lloyd's rounds (seed = embeddings of
    the k smallest ids, the shared no-RNG convention) and return
    (final ppm centroids, profile rows) — the centroids feed the
    exact-TRAINED retrieval index (round 8), the profile is the
    bit-replayable trajectory."""
    q = quantize_ppm(emb, id_col, col).persist()
    seed_rows = q.orderBy("vec_id").limit(k).collect()
    cents = [list(r["e"]) for r in seed_rows]
    if not cents:  # empty / all-NULL input: no seeds, so "training"
        # is undefined — return an empty profile instead of crashing
        # in _assign_expr on a zero-length struct array (the driver
        # fixtures are never empty; this is a robustness guard)
        q.unpersist()
        return [], []
    prof: list[tuple[int, int, int]] = []
    for t in range(1, iters + 1):
        assigned = q.select(
            "vec_id", "e", F.expr(_assign_expr(cents)).alias("b")
        ).select("vec_id", "e", F.col("b.d2").alias("d2"), F.col("b.cluster").alias("cluster"))
        inertia = int(assigned.agg(F.sum("d2")).collect()[0][0])
        # exact integer coordinate sums per (cluster, dim); ONE double
        # division + round per coordinate (identical in the oracle)
        means = (
            assigned.select("cluster", F.posexplode("e").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                F.expr(
                    "CAST(round(CAST(sum(v) AS DOUBLE) / count(1)) AS BIGINT)"
                ).alias("cv")
            )
            .collect()
        )
        new_cents = [list(cv) for cv in cents]  # empty cluster → keep
        by_cluster: dict[int, dict[int, int]] = {}
        for r in means:
            by_cluster.setdefault(r["cluster"], {})[r["pos"]] = r["cv"]
        for c, dims in by_cluster.items():
            new_cents[c] = [dims[p] for p in sorted(dims)]
        cents = new_cents
        l1 = sum(abs(x) for cv in cents for x in cv)
        prof.append((t, inertia, l1))
    q.unpersist()
    return cents, prof


def kmeans_fit_exact_profile(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    col: str = "embedding",
) -> DataFrame:
    """The registered-profile form of `kmeans_fit_exact`:
    (iteration, inertia, centroid_l1) — all BIGINT, hash-identical to
    the unrolled SQL replay."""
    _, prof = kmeans_fit_exact(emb, k, iters, id_col, col)
    return emb.sparkSession.createDataFrame(
        prof, "iteration bigint, inertia bigint, centroid_l1 bigint"
    )


def kmeans_exact_cte_parts(k: int = 8, iters: int = 5, dim: int = 64) -> list[str]:
    """The unrolled Lloyd's CTE stages ({prefix}q, {prefix}c0, then
    {prefix}a{t}/m{t}/c{t} per round) — shared by the profile oracle,
    the exact-TRAINED IVF retrieval oracle (round 8, appends
    assignment/probe/top-k stages over the final c{iters}), and the
    exact-TRAINED PQ/ADC oracle (round 8, one PREFIXED unroll per
    subspace over sliced vectors — pass `q_sql` defining
    ``{prefix}q(vec_id, e)``)."""
    return kmeans_exact_cte_parts_prefixed(k, iters, dim)


def kmeans_exact_cte_parts_prefixed(
    k: int = 8,
    iters: int = 5,
    dim: int = 64,
    prefix: str = "",
    q_sql: str | None = None,
) -> list[str]:
    p = prefix
    d2 = (
        "list_sum(list_transform(list_zip(q.e, c.cv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    # alias the prefixed base back to the local name `q` the d2
    # template uses; with no prefix keep the original byte-identical
    # text (the profile oracle is proven hash-green as written)
    qref = f"{p}q q" if p else "q"
    # Every stage is MATERIALIZED: the unroll is a chain where each
    # round's stages are referenced by the next round AND by the final
    # profile union — left to DuckDB's inlining heuristic the plan
    # re-evaluates whole prefixes of the chain, which is what actually
    # made the round-8 sweep superlinear (measured: 8× fixture 158 s
    # inlined vs 6.4 s materialized with the same aggregate argmin).
    if q_sql is None:
        q_sql = f"""{p}q AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        v -> CAST(round(CAST(v AS DOUBLE) * {SCALE}) AS BIGINT))
           AS e
  FROM embeddings WHERE embedding IS NOT NULL
)"""
    parts = [
        q_sql,
        f"""{p}c0 AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, e AS cv
  FROM (SELECT vec_id, e FROM {p}q ORDER BY vec_id LIMIT {k})
)""",
    ]
    # Assignment is a hash AGGREGATE, not a window: the (d2, cluster)
    # lexicographic argmin is packed into one BIGINT key d2·k+cluster
    # (cluster < k makes the encoding order-preserving; d2 ≤
    # dim·(2·SCALE)² ≈ 2.6e14, ×k ≪ 2⁶³) so min() picks the nearest
    # centroid with the ties→cluster-ascending rule and NO per-vector
    # sort — replacing the row_number()-over-(q×c) form flagged by the
    # round-8 sweep (growth_vs_linear 1.98, 42.6 s at 8×; with the
    # MATERIALIZED stages above the rewrite measures 6.35 s / 0.38).
    for t in range(1, iters + 1):
        parts.append(
            f"""{p}a{t} AS MATERIALIZED (
  SELECT vec_id, e, best % {k} AS cluster, best // {k} AS d2 FROM (
    SELECT q.vec_id, any_value(q.e) AS e,
           min({d2} * {k} + c.cluster) AS best
    FROM {qref} CROSS JOIN {p}c{t - 1} c
    GROUP BY q.vec_id
  )
)""",
        )
        parts.append(
            f"""{p}m{t} AS MATERIALIZED (
  SELECT cluster, pos,
         CAST(round(CAST(sum(v) AS DOUBLE) / count(*)) AS BIGINT) AS cv_j
  FROM (SELECT cluster, t.pos AS pos, e[t.pos] AS v
        FROM {p}a{t} CROSS JOIN (SELECT unnest(range(1, {dim + 1})) AS pos) t)
  GROUP BY cluster, pos
)""",
        )
        parts.append(
            f"""{p}c{t} AS MATERIALIZED (
  SELECT c.cluster, COALESCE(m.cv, c.cv) AS cv
  FROM {p}c{t - 1} c
  LEFT JOIN (SELECT cluster, list(cv_j ORDER BY pos) AS cv
             FROM {p}m{t} GROUP BY cluster) m USING (cluster)
)""",
        )
    return parts


def kmeans_exact_oracle_sql(k: int = 8, iters: int = 5, dim: int = 64) -> str:
    """The DuckDB replay: `iters` Lloyd's rounds unrolled as CTE
    stages over the same ppm integers (the mmr_sql/cep unrolling
    recipe applied to a training loop)."""
    parts = kmeans_exact_cte_parts(k, iters, dim)
    union = "\nUNION ALL\n".join(
        f"SELECT {t} AS iteration,"
        f" (SELECT CAST(sum(d2) AS BIGINT) FROM a{t}) AS inertia,"
        f" (SELECT CAST(sum(l1) AS BIGINT) FROM"
        f" (SELECT CAST(list_sum(list_transform(cv, x -> abs(x))) AS BIGINT)"
        f" AS l1 FROM c{t})) AS centroid_l1"
        for t in range(1, iters + 1)
    )
    body = ",\n".join(parts)
    return f"WITH {body}\nSELECT iteration, inertia, centroid_l1 FROM ({union})"
