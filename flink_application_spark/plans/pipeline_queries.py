"""Training-data pipeline queries: deterministic splits, stratified
sampling, sequence packing, SimHash near-dup pairs, funnel analysis,
corpus mixture planning.

These are the corpus-preparation operations a large-scale LLM data
pipeline runs between "raw documents" and "training shards"
(SURVEY.md north-star extensions; reference parity per
`EnrichmentApp.java` is covered by the cdr_* family). Every query is
engine-portable by construction: randomness is replaced with md5
arithmetic, floats are rounded on both sides, bit manipulation uses
div/mod or xor/bit_count that Spark and DuckDB evaluate identically.

Scale notes are per-query in the ``doc`` field — the common theme is
that per-document work stays scan-local (whole-stage codegen, no
Python) and the only shuffles are on small derived keys (buckets,
bands, strata), never on document bodies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from flink_application_spark.catalog import register_views
from flink_application_spark.functions.text import token_count
from flink_application_spark.plans.dedup_queries import _simhash_oracle
from flink_application_spark.plans.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return register_views(spark, sf_dir, tables=("documents",))["documents"]


def _md5_bucket(col: F.Column, lo: int, width: int, mod: int) -> F.Column:
    """Integer in [0, mod) from hex digits [lo, lo+width) of
    md5(CAST(col AS STRING)) — the engine-portable stand-in for a
    seeded RNG (same doc lands in the same bucket on every engine,
    run, and cluster size)."""
    hexpart = F.substring(F.md5(col.cast("string")), lo, width)
    return F.conv(hexpart, 16, 10).cast("bigint") % mod


def _md5_bucket_sql(expr: str, lo: int, width: int, mod: int) -> str:
    return (
        f"CAST(('0x' || substr(md5(CAST({expr} AS VARCHAR)), {lo}, {width})) "
        f"AS BIGINT) % {mod}"
    )


# ---------------------------------------------------------------------------
# 1. Hash-based train/val/test split
# ---------------------------------------------------------------------------

_SPLIT_CASE_SQL = (
    "CASE WHEN bucket < 80 THEN 'train' "
    "WHEN bucket < 90 THEN 'val' ELSE 'test' END"
)


@register(
    "doc_split_train_val_test",
    f"""
WITH b AS (
  SELECT lang,
         {_md5_bucket_sql('doc_id', 1, 8, 100)} AS bucket,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok
  FROM documents
)
SELECT {_SPLIT_CASE_SQL} AS split,
       lang,
       count(*) AS n_docs,
       sum(n_tok) AS n_tokens
FROM b
GROUP BY 1, 2
""",
    doc="Deterministic 80/10/10 train/val/test assignment: "
    "md5(doc_id) hex → bucket in [0,100) → split label, reported as "
    "per-(split, lang) doc and token counts. The assignment is "
    "scan-local arithmetic (no RNG state, identical on every engine "
    "and cluster size — the property a reproducible training run "
    "needs); the only shuffle is the final aggregate on the tiny "
    "(split, lang) key space with map-side partials.",
    tags=("pipeline", "sampling", "documents"),
)
def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    bucket = _md5_bucket(F.col("doc_id"), 1, 8, 100)
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(
            split.alias("split"),
            "lang",
            token_count(F.col("text")).cast("bigint").alias("n_tok"),
        )
        .groupBy("split", "lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )


# ---------------------------------------------------------------------------
# 2. Exact stratified sample
# ---------------------------------------------------------------------------


@register(
    "doc_stratified_sample",
    """
WITH ranked AS (
  SELECT doc_id, lang, source,
         row_number() OVER (PARTITION BY lang, source
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn,
         count(*) OVER (PARTITION BY lang, source) AS n_strata
  FROM documents
)
SELECT doc_id, lang, source, CAST(rn AS BIGINT) AS rn
FROM ranked
WHERE rn <= CAST(ceil(0.1 * n_strata) AS BIGINT)
""",
    doc="Exact 10% stratified sample per (lang, source) stratum: "
    "rank docs by md5(doc_id) inside each stratum, keep "
    "rn <= ceil(0.1 * stratum size). Unlike rate-based sampling this "
    "guarantees every stratum is represented with exactly the target "
    "count (small strata round up, never vanish). One shuffle on the "
    "stratum key; the per-stratum sort is bounded by stratum size, "
    "and at 100 TB a skewed stratum falls back to the md5-prefix "
    "systematic filter (doc_systematic_sample) which needs no sort.",
    tags=("pipeline", "sampling", "documents"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang", "source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    wc = Window.partitionBy("lang", "source")
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n_strata"),
        )
        .filter(F.col("rn") <= F.ceil(0.1 * F.col("n_strata")).cast("bigint"))
        .select("doc_id", "lang", "source", "rn")
    )


# ---------------------------------------------------------------------------
# 3. Token-budget sequence packing (concat-and-split)
# ---------------------------------------------------------------------------

_PACK_BUDGET = 2048
_PACK_SHARDS = 8


@register(
    "doc_pack_sequences",
    f"""
WITH t AS (
  SELECT doc_id,
         {_md5_bucket_sql('doc_id', 9, 4, _PACK_SHARDS)} AS shard,
         md5(CAST(doc_id AS VARCHAR)) AS okey,
         len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS n_tok
  FROM documents
),
packed AS (
  SELECT shard, doc_id, n_tok,
         sum(n_tok) OVER (PARTITION BY shard ORDER BY okey, doc_id
                          ROWS UNBOUNDED PRECEDING) AS running
  FROM t
)
SELECT shard,
       CAST((running - n_tok) // {_PACK_BUDGET} AS BIGINT) AS bin_id,
       count(*) AS n_docs,
       sum(n_tok) AS n_tokens
FROM packed
GROUP BY 1, 2
""",
    doc=f"Concat-and-split sequence packing: documents are laid out in "
    f"a deterministic md5 order inside {_PACK_SHARDS} md5-derived "
    f"shards, a running token prefix-sum assigns each doc to the "
    f"{_PACK_BUDGET}-token context-window bin its first token lands "
    f"in (GPT-style packing — bins are dense, no bin-packing search). "
    f"Reported as per-(shard, bin) doc/token counts. The scale story "
    f"is the shard dimension: prefix sums are per-shard, so packing "
    f"parallelizes across shards with one shuffle on the shard key "
    f"and a bounded per-shard sort — no global order, no driver loop.",
    tags=("pipeline", "packing", "documents"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    t = docs.select(
        "doc_id",
        _md5_bucket(F.col("doc_id"), 9, 4, _PACK_SHARDS).alias("shard"),
        F.md5(F.col("doc_id").cast("string")).alias("okey"),
        token_count(F.col("text")).cast("bigint").alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("okey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = t.withColumn("running", F.sum("n_tok").over(w))
    return (
        packed.select(
            "shard",
            F.floor((F.col("running") - F.col("n_tok")) / _PACK_BUDGET)
            .cast("bigint")
            .alias("bin_id"),
            "n_tok",
        )
        .groupBy("shard", "bin_id")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )


# ---------------------------------------------------------------------------
# 4. SimHash hamming near-dup pairs (banded, integer-exact)
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 16
_HAMMING_MAX = 3
_N_BANDS = 4  # pigeonhole: hamming <= 3 over 4 bands => >= 1 band equal


@register(
    "doc_simhash_near_dup_pairs",
    f"""
WITH s AS ({_simhash_oracle(_SIMHASH_BITS)})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM s a JOIN s b
  ON a.doc_id < b.doc_id
 AND bit_count(xor(a.simhash, b.simhash)) <= {_HAMMING_MAX}
""",
    doc=f"SimHash near-duplicate pairs: {_SIMHASH_BITS}-bit signatures, "
    f"pairs at hamming distance <= {_HAMMING_MAX}. The Spark plan is "
    f"the scale path — split the signature into {_N_BANDS} 4-bit "
    f"bands; by pigeonhole any pair within distance {_HAMMING_MAX} "
    f"agrees on >= 1 band, so candidates come from an equi-join on "
    f"(band_idx, band_value) (one shuffle on a 2-byte key, no O(n²)), "
    f"then bit_count(xor) verifies exactly. The oracle is the "
    f"brute-force quadratic self-join — same rows, integer-exact. "
    f"Cites the reference dedup role of `EnrichmentApp.java:142-156` "
    f"(its session-window dedup) generalized to content similarity.",
    tags=("dedup", "simhash", "pipeline"),
)
def q_simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.minhash import simhash_expr, with_shingles

    docs = _docs(spark, sf_dir)
    sigs = with_shingles(docs).select(
        "doc_id", simhash_expr(_SIMHASH_BITS).alias("simhash")
    )
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_idx"),
                        F.expr(f"shiftright(simhash, {4 * i}) & 15").alias("band_val"),
                    )
                    for i in range(_N_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sim_a"),
        "band_idx",
        "band_val",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sim_b"),
        "band_idx",
        "band_val",
    )
    return (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sim_a", "sim_b")
        .distinct()
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
            .cast("bigint")
            .alias("hamming"),
        )
        .filter(F.col("hamming") <= _HAMMING_MAX)
    )


# ---------------------------------------------------------------------------
# 5. Event funnel conversion
# ---------------------------------------------------------------------------


@register(
    "events_funnel_conversion",
    """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
  FROM events
  GROUP BY user_id
)
SELECT count(*) AS n_users,
       sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS n_view,
       sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                THEN 1 ELSE 0 END) AS n_view_click,
       sum(CASE WHEN t_view IS NOT NULL AND t_click > t_view
                 AND t_purchase > t_click
                THEN 1 ELSE 0 END) AS n_view_click_purchase
FROM per_user
""",
    doc="Ordered funnel analysis over the events stream: per user, the "
    "first view / click / purchase timestamps (conditional min-"
    "aggregates — one shuffle on user_id with map-side partials), "
    "then stage counts requiring strict temporal order "
    "view < click < purchase. The classic product-analytics query a "
    "sessionized event table answers; NULL comparisons drop users "
    "missing a stage on both engines identically.",
    tags=("events", "funnel", "analytics"),
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = register_views(spark, sf_dir, tables=("events",))["events"]

    def first_ts(kind: str) -> F.Column:
        return F.min(F.when(F.col("event_type") == kind, F.col("ts")))

    per_user = events.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    reached_click = F.col("t_view").isNotNull() & (F.col("t_click") > F.col("t_view"))
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0)).alias("n_view"),
        F.sum(F.when(reached_click, 1).otherwise(0)).alias("n_view_click"),
        F.sum(
            F.when(reached_click & (F.col("t_purchase") > F.col("t_click")), 1).otherwise(0)
        ).alias("n_view_click_purchase"),
    )


# ---------------------------------------------------------------------------
# 6. Corpus mixture plan
# ---------------------------------------------------------------------------


@register(
    "corpus_mixture_plan",
    """
WITH per_lang AS (
  SELECT lang,
         count(*) AS n_docs,
         sum(len(regexp_split_to_array(lower(trim(text)), '\\s+'))) AS n_tokens
  FROM documents
  GROUP BY lang
)
SELECT lang, n_docs, n_tokens,
       round(CAST(min(n_tokens) OVER () AS DOUBLE) / n_tokens, 6) + 0.0
         AS sample_rate
FROM per_lang
""",
    doc="Corpus mixture planning: per-language token totals and the "
    "downsampling rate that balances every language to the smallest "
    "one (uniform mixture target — the knob multilingual training "
    "mixes turn). Token counting is scan-local; the aggregate "
    "shuffles on the tiny lang key; the global min is a window over "
    "the handful of aggregated rows, not the corpus. Feeding the "
    "rate back into the md5-bucket filter of doc_systematic_sample "
    "turns the plan into an executable sampler.",
    tags=("pipeline", "sampling", "documents"),
)
def q_corpus_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    per_lang = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col("text")).cast("bigint")).alias("n_tokens"),
    )
    floor_tokens = per_lang.agg(F.min("n_tokens").alias("_floor"))
    return per_lang.crossJoin(F.broadcast(floor_tokens)).select(
        "lang",
        "n_docs",
        "n_tokens",
        (
            F.round(F.col("_floor").cast("double") / F.col("n_tokens"), 6)
            + F.lit(0.0)
        ).alias("sample_rate"),
    )
