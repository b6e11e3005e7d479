"""Exact-TRAINED product quantization + ADC top-k — the second half of
the round-8 trained-index conversion (`operators/ivf_exact.py` did the
coarse quantizer; this does the CODEBOOKS).

Classic PQ (Jégou et al., TPAMI 2011) splits vectors into m subspaces
and trains a k-means codebook per subspace; ADC scores a query against
a candidate by summing per-subspace distances between the query's
subvector and the candidate's ASSIGNED CODEWORD. Conventionally the
codebooks are float Lloyd's — engine-dependent, hence
`emb_pq_trained_adc_topk` stayed rows-only. Here every subspace
codebook is trained by the exact-integer Lloyd's loop
(`kmeans_exact.kmeans_fit_exact` on the ppm-sliced subvectors), so the
codebooks, the corpus codes, every ADC table cell, and the final
ranking are exact BIGINTs — the full PQ lifecycle replays in DuckDB as
m prefixed copies of the shared training unroll
(`kmeans_exact_cte_parts_prefixed`) plus long-format code/codebook
joins.

Approximation semantics are unchanged from float PQ: the ADC score is
the exact d² between the query subvector and the candidate's quantized
representation — approximation error comes from quantization (as
designed), never from float nondeterminism. Scale shape: codes are a
scan-local broadcast-literal expression (corpus vectors never
shuffle); queries broadcast; the ADC sum is one expression per
(query, candidate); top-k is a per-query window. Training cost is
m small independent kmeans_exact loops (8-dim subvectors), driver
state m·k'·d/m = k'·d integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_application_spark.operators.kmeans_exact import (
    SCALE,
    kmeans_exact_cte_parts_prefixed,
    kmeans_fit_exact,
    quantize_ppm,
)

M = 8  # subspaces
DSUB = 8  # dims per subspace (m · dsub = 64)
KCODE = 8  # codewords per subspace
ITERS = 3  # Lloyd's rounds per codebook


def pq_exact_train(emb: DataFrame) -> list[list[list[int]]]:
    """Per-subspace exact-integer codebooks: M lists of KCODE ppm
    codewords (DSUB ints each). Slicing before quantization equals
    quantizing then slicing (transform is element-wise), which is what
    the oracle's `e[lo:hi]` slice of the shared quantized base does."""
    books: list[list[list[int]]] = []
    for s in range(M):
        sub = emb.select(
            "vec_id",
            F.expr(f"slice(embedding, {s * DSUB + 1}, {DSUB})").alias("embedding"),
        )
        cents, _ = kmeans_fit_exact(sub, k=KCODE, iters=ITERS)
        books.append(cents)
    return books


def _cw_structs(vec_expr: str, book: list[list[int]]) -> str:
    return ", ".join(
        "named_struct('d2', aggregate(zip_with(" + vec_expr + ", array("
        + ", ".join(f"{int(c)}L" for c in cv)
        + "), (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x), "
        f"'cluster', {j})"
        for j, cv in enumerate(book)
    )


def pq_exact_adc_topk(
    emb: DataFrame,
    k: int = 10,
    *,
    n_queries: int = 5,
) -> DataFrame:
    """(query_id, vec_id, adc_q, rank): ADC top-k of the first
    `n_queries` vec_ids under exact-trained codebooks — every number
    an exact integer, hash-replayable end to end."""
    books = pq_exact_train(emb)
    if not books or not books[0]:
        return emb.sparkSession.createDataFrame(
            [], "query_id bigint, vec_id bigint, adc_q bigint, rank int"
        )
    q = quantize_ppm(emb)
    code_exprs = [
        "element_at(array_sort(array("
        + _cw_structs(f"slice(e, {s * DSUB + 1}, {DSUB})", books[s])
        + ")), 1).cluster"
        for s in range(M)
    ]
    coded = q.select(
        "vec_id", F.expr("array(" + ", ".join(code_exprs) + ")").alias("codes")
    )
    # ADC discipline (same as pq.pq_adc_topk): per QUERY, precompute
    # the KCODE-entry exact-d² table per subspace ONCE — per candidate
    # the score is then m table lookups + adds, never a fold
    adc_tables = [
        F.expr(
            "array("
            + ", ".join(
                "aggregate(zip_with(slice(e, "
                + f"{s * DSUB + 1}, {DSUB}), array("
                + ", ".join(f"{int(c)}L" for c in cv)
                + "), (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"
                for cv in books[s]
            )
            + ")"
        ).alias(f"_adc_{s}")
        for s in range(M)
    ]
    queries = q.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), *adc_tables
    )
    adc = " + ".join(
        f"element_at(_adc_{s}, element_at(codes, {s + 1}) + 1)" for s in range(M)
    )
    cand = (
        coded.crossJoin(F.broadcast(queries))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.expr(adc).alias("adc_q"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_q").asc(), F.col("vec_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "adc_q", "rank")
    )


def pq_exact_adc_oracle_sql(
    k: int = 10,
    *,
    n_queries: int = 5,
    dim: int = 64,
) -> str:
    """The DuckDB replay: one prefixed kmeans_exact training unroll per
    subspace over `e[lo:hi]` slices of the shared quantized base, then
    long-format (vec, s, code) assignment, (s, code, codeword) books,
    per-subspace exact d², and the summed ADC top-k."""
    d2 = (
        "list_sum(list_transform(list_zip(q.e, c.cv),"
        " p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )
    parts = [
        f"""qb AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding,
                        v -> CAST(round(CAST(v AS DOUBLE) * {SCALE}) AS BIGINT))
           AS e
  FROM embeddings WHERE embedding IS NOT NULL
)"""
    ]
    for s in range(M):
        lo, hi = s * DSUB + 1, (s + 1) * DSUB
        parts.extend(
            kmeans_exact_cte_parts_prefixed(
                KCODE,
                ITERS,
                DSUB,
                prefix=f"s{s}",
                q_sql=f"""s{s}q AS MATERIALIZED (
  SELECT vec_id, e[{lo}:{hi}] AS e FROM qb
)""",
            )
        )
        # argmin-as-aggregate (the kmeans_exact a{t} encoding): the
        # packed min(d2·k+code) key replaces the per-vector window
        # sort measured superlinear in DuckDB at 8× fixture growth
        parts.append(
            f"""scode{s} AS (
  SELECT vec_id, best % {KCODE} AS code FROM (
    SELECT q.vec_id, min({d2} * {KCODE} + c.cluster) AS best
    FROM s{s}q q CROSS JOIN s{s}c{ITERS} c
    GROUP BY q.vec_id
  )
)"""
        )
    parts.append(
        "codes AS (\n"
        + "\n  UNION ALL\n".join(
            f"  SELECT vec_id, {s} AS s, code FROM scode{s}" for s in range(M)
        )
        + "\n)"
    )
    parts.append(
        "books AS (\n"
        + "\n  UNION ALL\n".join(
            f"  SELECT {s} AS s, cluster, cv FROM s{s}c{ITERS}" for s in range(M)
        )
        + "\n)"
    )
    parts.append(
        "qsub AS (\n"
        + "\n  UNION ALL\n".join(
            f"  SELECT vec_id AS query_id, {s} AS s,"
            f" e[{s * DSUB + 1}:{(s + 1) * DSUB}] AS qv"
            f" FROM qb WHERE vec_id < {n_queries}"
            for s in range(M)
        )
        + "\n)"
    )
    parts.append(
        """persub AS (
  SELECT q.query_id, c.vec_id,
         CAST(list_sum(list_transform(list_zip(q.qv, b.cv),
                                      z -> (z[1] - z[2]) * (z[1] - z[2])))
              AS BIGINT) AS d2s
  FROM qsub q
  JOIN codes c ON c.s = q.s
  JOIN books b ON b.s = q.s AND b.cluster = c.code
  WHERE c.vec_id <> q.query_id
)"""
    )
    parts.append(
        """cand AS (
  SELECT query_id, vec_id, CAST(sum(d2s) AS BIGINT) AS adc_q
  FROM persub GROUP BY query_id, vec_id
)"""
    )
    body = ",\n".join(parts)
    return f"""WITH {body}
SELECT query_id, vec_id, adc_q, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, vec_id, adc_q,
         row_number() OVER (
           PARTITION BY query_id ORDER BY adc_q ASC, vec_id ASC
         ) AS rank
  FROM cand
) WHERE rank <= {k}"""
