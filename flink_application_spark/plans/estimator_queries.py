"""Estimator-quality and statistical-sampling queries.

Two additions a production curation pipeline runs before trusting its
own approximations:

- **MinHash estimator error** — the LSH dedup path (dedup_queries)
  decides from the ESTIMATED Jaccard implied by signature agreement;
  this query measures that estimator against exact Jaccard on the very
  candidate pairs the pipeline generates (the textbook property: the
  match fraction of k independent minhashes is an unbiased estimator
  of J with variance J(1-J)/k — Broder 1997). Everything is
  md5-deterministic, so DuckDB reproduces signatures, candidates,
  estimates and errors bit-for-bit.
- **Neyman-allocated stratified sample** — optimal allocation
  (Neyman 1934): stratum h gets sample share ∝ N_h·σ_h, so
  high-variance strata are oversampled at fixed total budget. The
  allocation arithmetic is kept INTEGER (rounded weights, integer
  division) so both engines derive identical counts — float
  summation-order ulps can't flip a floor().

Scale notes: the error query adds one narrow join to the existing LSH
shuffle (signatures are k small strings per doc; bodies never move).
The sampler is one stats aggregate (|strata| rows), one 1-row
broadcast normalizer append, and a per-stratum md5 rank — the same
range-partitionable window every other sampler here uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.minhash import (
    DEFAULT_K,
    jaccard_column,
    lsh_candidate_pairs,
    with_minhash_signature,
    with_shingles,
)
from flink_application_spark.plans.dedup_queries import (
    SHINGLES_CTE,
    _pairs_cte,
    _sigs_cte,
    JACCARD_SQL,
)
from flink_application_spark.plans.registry import register

_MATCH_SQL = " + ".join(
    f"(CASE WHEN ma.mh{i} = mb.mh{i} THEN 1 ELSE 0 END)" for i in range(DEFAULT_K)
)


@register(
    "doc_minhash_estimate_error",
    "WITH "
    + SHINGLES_CTE
    + ","
    + _sigs_cte()
    + ","
    + _pairs_cte()
    + f"""
SELECT p.id_a AS id_a, p.id_b AS id_b,
       {JACCARD_SQL} AS jaccard_exact,
       round(({_MATCH_SQL}) / {DEFAULT_K}.0, 6) AS jaccard_est,
       round(abs({JACCARD_SQL} - round(({_MATCH_SQL}) / {DEFAULT_K}.0, 6)), 6)
         AS abs_err
FROM pairs p
JOIN sh sa ON sa.doc_id = p.id_a
JOIN sh sb ON sb.doc_id = p.id_b
JOIN mh ma ON ma.doc_id = p.id_a
JOIN mh mb ON mb.doc_id = p.id_b
""",
    doc=f"MinHash estimator audit on the LSH candidate pairs: exact "
    f"Jaccard vs the signature estimate (agreeing fraction of "
    f"{DEFAULT_K} minhashes — unbiased with variance J(1-J)/k, "
    "Broder'97) and the absolute error, per pair. This is the "
    "measurement that justifies trusting signature agreement at 100 TB "
    "where exact verification of every pair is unaffordable. Fully "
    "md5-deterministic — oracle reproduces every estimate.",
    tags=("dedup", "minhash", "eval"),
)
def q_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    sh = with_shingles(docs).persist()
    sig = with_minhash_signature(sh)
    pairs = lsh_candidate_pairs(sh)
    a = sig.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
        *[F.col(f"mh{i}").alias(f"a_mh{i}") for i in range(DEFAULT_K)],
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
        *[F.col(f"mh{i}").alias(f"b_mh{i}") for i in range(DEFAULT_K)],
    )
    matches = sum(
        F.when(F.col(f"a_mh{i}") == F.col(f"b_mh{i}"), 1).otherwise(0)
        for i in range(DEFAULT_K)
    )
    est = F.round(matches / F.lit(float(DEFAULT_K)), 6)
    exact = jaccard_column(F.col("sh_a"), F.col("sh_b"))
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            exact.alias("jaccard_exact"),
            est.alias("jaccard_est"),
            F.round(F.abs(exact - est), 6).alias("abs_err"),
        )
    )


_BUDGET = 100  # total sample size across strata


@register(
    "doc_stratified_sample_neyman",
    f"""
WITH strat AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_h,
         -- integer weight: summation-order ulps cannot flip the floor
         CAST(round(count(*) * stddev_pop(n_chars)) AS BIGINT) AS w_h
  FROM documents GROUP BY source
),
z AS (SELECT CAST(sum(w_h) AS BIGINT) AS z FROM strat),
alloc AS (
  SELECT source, n_h,
         greatest(CAST(1 AS BIGINT), ({_BUDGET} * w_h) // z.z) AS take_n
  FROM strat, z
),
ranked AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (
           PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         ) AS strat_rank
  FROM documents
)
SELECT r.doc_id AS doc_id, r.source AS source, r.n_chars AS n_chars,
       CAST(r.strat_rank AS BIGINT) AS strat_rank,
       a.take_n AS stratum_quota
FROM ranked r JOIN alloc a ON a.source = r.source
WHERE r.strat_rank <= a.take_n
""",
    doc=f"Neyman-allocated stratified sample (budget {_BUDGET}): each "
    "source stratum's quota ∝ N_h·σ_h(n_chars) — high-variance strata "
    "oversampled at fixed cost, the survey-sampling optimum. Within a "
    "stratum the pick is the md5(doc_id) rank (deterministic, "
    "retry-safe, no RNG state). Allocation uses ROUNDED-INTEGER "
    "weights + integer division so both engines compute identical "
    "quotas. One stats agg + one 1-row normalizer broadcast + one "
    "per-stratum window.",
    tags=("documents", "sampling"),
)
def q_stratified_neyman(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    strat = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.round(F.count(F.lit(1)) * F.stddev_pop("n_chars"))
        .cast("bigint")
        .alias("w_h"),
    )
    z = strat.agg(F.sum("w_h").alias("z"))
    alloc = strat.join(F.broadcast(z)).select(
        "source",
        F.greatest(
            F.lit(1).cast("bigint"), F.expr(f"({_BUDGET} * w_h) div z")
        ).alias("take_n"),
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = docs.select(
        "doc_id", "source", "n_chars", F.row_number().over(w).alias("strat_rank")
    )
    return (
        ranked.join(F.broadcast(alloc), "source")
        .filter(F.col("strat_rank") <= F.col("take_n"))
        .select(
            "doc_id",
            "source",
            "n_chars",
            F.col("strat_rank").cast("bigint").alias("strat_rank"),
            F.col("take_n").alias("stratum_quota"),
        )
    )
