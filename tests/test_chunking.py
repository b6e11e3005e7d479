"""Chunking contracts (oracle parity in test_oracle_parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.functions.text import tokens
from flink_application_spark.plans.chunk_queries import _STRIDE, _WINDOW, chunk_windows


def test_chunk_coverage_and_bounds(spark, sf_dir):
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    chunks = chunk_windows(docs).cache()

    # exact size law: chunk_tok == min(window, n_doc_tokens - start)
    ntok = docs.select(
        "doc_id",
        F.size(F.filter(tokens(F.col("text")), lambda t: t != "")).alias("n"),
    ).filter(F.col("n") >= 1)
    assert (
        chunks.join(ntok, "doc_id")
        .filter(
            F.col("chunk_tok")
            != F.least(F.lit(_WINDOW), F.col("n") - F.col("start_tok"))
        )
        .count()
        == 0
    )

    # coverage: per doc, max(start_tok + chunk_tok) == token count and
    # the last start is exactly (n_chunks - 1) * stride
    cover = chunks.groupBy("doc_id").agg(
        F.max(F.col("start_tok") + F.col("chunk_tok")).alias("covered"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("start_tok").alias("max_start"),
    )
    joined = ntok.join(cover, "doc_id")
    assert joined.filter(F.col("covered") != F.col("n")).count() == 0
    assert joined.filter(
        F.col("max_start") != (F.col("n_chunks") - 1) * _STRIDE
    ).count() == 0

    # fingerprints: equal md5 <=> equal chunk_text
    dup = (
        chunks.groupBy("chunk_md5")
        .agg(F.countDistinct("chunk_text").alias("d"))
        .filter(F.col("d") > 1)
        .count()
    )
    assert dup == 0
    chunks.unpersist()
