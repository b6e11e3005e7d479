"""DuckDB replay of the greedy MMR re-ranker (`operators/similarity.
mmr_rerank_cands`) — the round-7 rows-only→oracle conversion.

Greedy sequential selection is replayable in ONE static SQL string
because (a) k_final is a small fixed constant, so the loop unrolls
into k_final argmax CTE stages, and (b) the operator scores in EXACT
integer micro-units (ppm relevance / pair similarities; λ as tenths),
so every cross-engine comparison is integer — no float summation-order
or rounding-boundary hazard in the selection itself. The same trick as
the seeded-IVF oracles (plans/ann_twins._seeded_cand_cte): make the
computation deterministic-by-construction, then unroll it.

The caller provides a WITH-body that defines:

- ``e(vec_id, emb)`` — DOUBLE[] vectors (used for pair similarities);
- ``tk(query_id, vec_id, cosine)`` — the candidate retrieval, cosine
  rounded to 6 (the relevance input).

`mmr_oracle_sql` appends the pair-similarity CTE, the unrolled
stages, and the rank-stamped union select.
"""

from __future__ import annotations

_COS = (
    "round(list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))), 6)"
)


def mmr_stages_sql(k_final: int, lam10: int) -> str:
    """CTE chain over tk/pair: relp (ppm relevance), s1..s{k} (one
    selection each: argmax of lam10·rel_ppm − (10−lam10)·max sim_ppm
    over the not-yet-selected, ties → vec_id asc), sel{k} (cumulative
    selected set)."""
    if not 0 <= lam10 <= 10:
        raise ValueError(f"lam10 must be in [0, 10], got {lam10}")
    parts = [
        """relp AS MATERIALIZED (
  SELECT query_id, vec_id, cosine,
         CAST(round(cosine * 1000000) AS BIGINT) AS rel_ppm
  FROM tk
)""",
        f"""s1 AS MATERIALIZED (
  SELECT query_id, vec_id, cosine, {lam10} * rel_ppm AS mmr_e7 FROM (
    SELECT query_id, vec_id, cosine, rel_ppm,
           row_number() OVER (
             PARTITION BY query_id ORDER BY rel_ppm DESC, vec_id ASC
           ) AS rn
    FROM relp
  ) WHERE rn = 1
)""",
        "sel1 AS MATERIALIZED (SELECT query_id, vec_id FROM s1)",
    ]
    for k in range(2, k_final + 1):
        parts.append(
            f"""m{k} AS MATERIALIZED (
  SELECT r.query_id, r.vec_id, r.cosine,
         {lam10} * r.rel_ppm - {10 - lam10} * (
           SELECT max(p.sim_ppm) FROM pair p
           JOIN sel{k - 1} s ON s.query_id = p.query_id AND s.vec_id = p.j
           WHERE p.query_id = r.query_id AND p.i = r.vec_id
         ) AS mmr_e7
  FROM relp r
  WHERE NOT EXISTS (
    SELECT 1 FROM sel{k - 1} s
    WHERE s.query_id = r.query_id AND s.vec_id = r.vec_id
  )
)""",
        )
        parts.append(
            f"""s{k} AS MATERIALIZED (
  SELECT query_id, vec_id, cosine, mmr_e7 FROM (
    SELECT query_id, vec_id, cosine, mmr_e7,
           row_number() OVER (
             PARTITION BY query_id ORDER BY mmr_e7 DESC, vec_id ASC
           ) AS rn
    FROM m{k}
  ) WHERE rn = 1
)""",
        )
        if k < k_final:
            parts.append(
                f"sel{k} AS MATERIALIZED (SELECT query_id, vec_id FROM sel{k - 1}"
                f" UNION ALL SELECT query_id, vec_id FROM s{k})"
            )
    return ",\n".join(parts)


def mmr_oracle_sql(with_body: str, k_final: int, lam10: int) -> str:
    """Full oracle: `with_body` defines e(vec_id, emb) and
    tk(query_id, vec_id, cosine); output schema matches
    mmr_rerank_cands — (query_id, vec_id, rank, relevance,
    mmr_score = mmr_e7/1e7, identical IEEE division both engines)."""
    pair = f"""pair AS MATERIALIZED (
  SELECT a.query_id, a.vec_id AS i, b.vec_id AS j,
         CAST(round({_COS.format(a='ea.emb', b='eb.emb')} * 1000000) AS BIGINT)
           AS sim_ppm
  FROM tk a
  JOIN tk b ON b.query_id = a.query_id AND b.vec_id <> a.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
)"""
    union = "\nUNION ALL\n".join(
        f"SELECT query_id, vec_id, {k} AS rank, cosine AS relevance,"
        f" mmr_e7 / 10000000.0 AS mmr_score FROM s{k}"
        for k in range(1, k_final + 1)
    )
    return (
        f"WITH {with_body},\n{pair},\n"
        f"{mmr_stages_sql(k_final, lam10)}\n{union}"
    )
