"""Exact-integer power iteration — the oracle-replayable spectral
step.

`operators/pca.top_component` is rows-only by necessity: the Gram
accumulation is a float sum (order-dependent ulps) and the driver
eigensolver (numpy eigh / float power iteration) has no SQL replay.
This variant applies the round-7 determinism recipe to the spectral
blocker class, completing the trio (seeded indexes → retrieval,
integer MMR/Lloyd's → greedy & training, THIS → iterative linear
algebra):

- coordinates quantize once to ppm BIGINTs
  (`kmeans_exact.quantize_ppm`);
- the Gram matrix is EXACT integer Σ xᵢxⱼ (int64 matmul partials over
  ≤10k-row chunks — per-row products ≤ (1.1e6)² ≈ 1.2e12, so a chunk
  partial is ≤ 1.2e16 ≪ 2⁶³ regardless of Arrow batch sizing or rows
  per partition — combined by an order-free DECIMAL(38,0) groupBy sum,
  the same unbounded headroom as the oracle's HUGEINT);
- each power-iteration step is w = G·v in ARBITRARY-PRECISION integer
  arithmetic (Python bigint on the driver; HUGEINT in the DuckDB
  replay), renormalized by the max-|w| coordinate with TRUNCATING
  integer division (DuckDB's `//` truncates toward zero — Python's
  floors, so the driver mirrors truncation via a sign split);
- output is the full per-iteration trajectory as long rows
  (iteration, pos, v) — 64 exact integers per round, every one in the
  driver's value hash.

`tests/test_pca_exact.py` pins |cos| ≥ 0.999 vs numpy.linalg.eigh's
top eigenvector on a planted-spike corpus (the driver embeddings are
deliberately isotropic — top eigengap ≈ 1.07 — so convergence there is
slow for ANY power method; on the fixture the pinned property is the
guaranteed one, Rayleigh-quotient monotonicity), an exact int64
numpy-reference check of the Gram, and bit-determinism under
repartitioning. The float path (emb_pca_gram / emb_pca_top_component)
stays registered; its blocker row now points here.

Scale shape: identical to the float PCA — one Gram pass whose shuffle
carries O(d²) integers per partition, then O(d²)-per-iteration driver
math; the corpus is never touched again.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

from flink_application_spark.operators.kmeans_exact import quantize_ppm


def int_gram_long(q: DataFrame, dim: int = 64) -> DataFrame:
    """(i, j, g): exact integer Gram Σ eᵢ·eⱼ of ppm vectors — the
    integer twin of pca.gram_long (full matrix, not upper triangle:
    the matvec replay wants direct lookups). Partials are int64 over
    bounded ≤10k-row chunks; the cross-partial sum is DECIMAL(38,0)
    so the Spark side carries the oracle's HUGEINT headroom (a plain
    BIGINT sum would silently wrap in non-ANSI mode at ~7.6e6 ppm
    rows per partition)."""
    import numpy as np
    import pandas as pd

    from flink_application_spark.catalog import fan_out

    # 1e4 rows × (1.1e6 ppm)² ≈ 1.2e16 ≪ 2⁶³: each chunk partial is
    # int64-safe independent of Arrow batch size or partition size.
    chunk = 10_000

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ii, jj = np.indices((dim, dim))
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.array(pdf["e"].tolist(), dtype=np.int64)
            if x.shape[1] != dim:
                raise ValueError(f"expected dim {dim}, got {x.shape[1]}")
            for s in range(0, len(x), chunk):
                blk = x[s : s + chunk]
                yield pd.DataFrame(
                    {"i": ii.ravel(), "j": jj.ravel(), "g": (blk.T @ blk).ravel()}
                )

    from pyspark.sql import functions as F

    return (
        fan_out(q.select("e"))
        .mapInPandas(part, schema="i int, j int, g long")
        .groupBy("i", "j")
        .agg(F.sum(F.col("g").cast("decimal(38,0)")).alias("g"))
    )


def _trunc_div(x: int, d: int) -> int:
    """Integer division truncating toward zero — DuckDB's `//`
    semantics (Python's // floors, which differs for negative x)."""
    q = abs(x) // d
    return q if x >= 0 else -q


def pca_power_exact_trajectory(
    emb: DataFrame, iters: int = 8, dim: int = 64
) -> DataFrame:
    """Run `iters` exact-integer power-iteration rounds from the
    all-ones ppm start vector and return every round's renormalized
    vector as long rows (iteration, pos, v) — bit-identical to the
    unrolled SQL replay (`pca_power_exact_oracle_sql`)."""
    spark = emb.sparkSession
    q = quantize_ppm(emb)
    cells = int_gram_long(q, dim).collect()
    if not cells:  # empty / all-NULL input: the oracle's g CTE is
        # empty so every unrolled stage is too — emit zero rows, not
        # iters·dim zero-vector rows
        return spark.createDataFrame([], "iteration bigint, pos bigint, v bigint")
    G = [[0] * dim for _ in range(dim)]
    for r in cells:
        G[r["i"]][r["j"]] = int(r["g"])
    v = [10**6] * dim
    rows: list[tuple[int, int, int]] = []
    for t in range(1, iters + 1):
        w = [sum(G[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        mw = max(abs(x) for x in w) or 1
        v = [_trunc_div(x * 10**6, mw) for x in w]
        rows.extend((t, p, v[p]) for p in range(dim))
    return spark.createDataFrame(rows, "iteration bigint, pos bigint, v bigint")


def pca_power_exact_oracle_sql(iters: int = 8, dim: int = 64) -> str:
    """DuckDB replay: exact HUGEINT Gram + `iters` matvec/renormalize
    stages unrolled as CTEs (truncating `//`, max-|w| normalizer).
    Every stage is AS MATERIALIZED: DuckDB inlines plain CTEs, and
    with v{t} referencing w{t} twice the unrolled chain would
    re-expand the 12M-row Gram aggregation 2^iters times (measured:
    the un-materialized form ran >9 min; materialized, seconds)."""
    parts = [
        f"""q AS MATERIALIZED (
  SELECT list_transform(embedding,
                        v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))
           AS e
  FROM embeddings WHERE embedding IS NOT NULL
)""",
        f"""g AS MATERIALIZED (
  SELECT i.i AS i, j.j AS j,
         sum(CAST(e[i.i + 1] AS HUGEINT) * e[j.j + 1]) AS g
  FROM q
  CROSS JOIN (SELECT unnest(range(0, {dim})) AS i) i
  CROSS JOIN (SELECT unnest(range(0, {dim})) AS j) j
  GROUP BY 1, 2
)""",
        f"""v0 AS MATERIALIZED (
  SELECT unnest(range(0, {dim})) AS pos, CAST(1000000 AS HUGEINT) AS v
)""",
    ]
    for t in range(1, iters + 1):
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT g.i AS pos, sum(g.g * v.v) AS w
  FROM g JOIN v{t - 1} v ON v.pos = g.j
  GROUP BY g.i
)""",
        )
        parts.append(
            f"""v{t} AS MATERIALIZED (
  SELECT pos, (w * 1000000) // greatest((SELECT max(abs(w)) FROM w{t}), 1) AS v
  FROM w{t}
)""",
        )
    union = "\nUNION ALL\n".join(
        f"SELECT {t} AS iteration, CAST(pos AS BIGINT) AS pos,"
        f" CAST(v AS BIGINT) AS v FROM v{t}"
        for t in range(1, iters + 1)
    )
    body = ",\n".join(parts)
    return f"WITH {body}\n{union}"
