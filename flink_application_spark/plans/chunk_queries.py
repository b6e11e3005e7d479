"""Document chunking — the context-window preparation step every
RAG / pretraining pipeline runs: split each document into overlapping
token windows with stable ids and dedup-ready fingerprints.

Scale shape: chunking is 100% scan-local (tokenize once, emit slices
via a sequence+transform explode — no shuffle, no Python); the output
carries (doc_id, chunk_idx) so downstream embedding / dedup stages
partition on doc_id without re-reading text. The overlap policy is the
standard sliding window with a trailing partial chunk, so every token
appears in ≥ 1 chunk and boundary context is preserved.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.functions.text import tokens
from flink_application_spark.plans.registry import register

_WINDOW = 32
_STRIDE = 24


def chunk_windows(
    docs: DataFrame, window: int = _WINDOW, stride: int = _STRIDE
) -> DataFrame:
    """(doc_id, chunk_idx, start_tok, chunk_tok, chunk_text, chunk_md5):
    overlapping token windows of ``window`` tokens every ``stride``
    (trailing partial kept). Docs with no tokens emit nothing."""
    if not (0 < stride <= window):
        raise ValueError(f"need 0 < stride <= window, got {stride} > {window}")
    toks = docs.select(
        "doc_id",
        F.filter(tokens(F.col("text")), lambda t: t != "").alias("toks"),
    ).filter(F.size("toks") >= 1)
    chunks = toks.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("toks") - 1, F.lit(stride)),
                lambda start: F.struct(
                    (start / F.lit(stride)).cast("int").alias("chunk_idx"),
                    start.cast("bigint").alias("start_tok"),
                    F.slice(F.col("toks"), start + 1, window).alias("ctoks"),
                ),
            )
        ).alias("ch"),
    )
    return chunks.select(
        "doc_id",
        "ch.chunk_idx",
        "ch.start_tok",
        F.size("ch.ctoks").cast("bigint").alias("chunk_tok"),
        F.concat_ws(" ", "ch.ctoks").alias("chunk_text"),
        F.md5(F.concat_ws(" ", "ch.ctoks")).alias("chunk_md5"),
    )


@register(
    "doc_chunk_windows",
    f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents
),
starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS start
  FROM toks WHERE len(toks) >= 1
),
chunks AS (
  SELECT doc_id,
         CAST(start // {_STRIDE} AS INTEGER) AS chunk_idx,
         CAST(start AS BIGINT) AS start_tok,
         list_slice(toks, start + 1, least(start + {_WINDOW}, len(toks))) AS ctoks
  FROM starts
)
SELECT doc_id, chunk_idx, start_tok,
       CAST(len(ctoks) AS BIGINT) AS chunk_tok,
       array_to_string(ctoks, ' ') AS chunk_text,
       md5(array_to_string(ctoks, ' ')) AS chunk_md5
FROM chunks
""",
    doc=f"Sliding-window chunking ({_WINDOW}-token windows every "
    f"{_STRIDE}, trailing partial kept): one scan-local tokenize + "
    "sequence/transform explode — zero shuffle, zero Python; emits "
    "stable (doc_id, chunk_idx) ids and an md5 fingerprint per chunk "
    "so chunk-level exact dedup is a groupBy away.",
    tags=("documents", "chunking", "rag"),
)
def q_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    return chunk_windows(docs)


@register(
    "doc_chunk_exact_dedup_groups",
    f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                     w -> w <> '') AS toks
  FROM documents
),
starts AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, {_STRIDE})) AS start
  FROM toks WHERE len(toks) >= 1
),
chunks AS (
  SELECT doc_id,
         md5(array_to_string(
           list_slice(toks, start + 1, least(start + {_WINDOW}, len(toks))),
           ' ')) AS chunk_md5
  FROM starts
)
SELECT chunk_md5,
       CAST(count(*) AS BIGINT) AS n_copies,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc
FROM chunks
GROUP BY chunk_md5
HAVING count(*) > 1
""",
    doc="Chunk-level exact dedup: identical chunk fingerprints "
    "appearing more than once (within OR across documents) — the "
    "boilerplate-span detector at chunk granularity, one hash "
    "aggregate over the fingerprint column (16 bytes/chunk in the "
    "shuffle, never chunk text). Canonical = lowest doc_id.",
    tags=("documents", "chunking", "dedup"),
)
def q_chunk_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    return (
        chunk_windows(docs)
        .groupBy("chunk_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc"),
        )
        .filter(F.col("n_copies") > 1)
    )
