"""End-to-end streaming RAG intake: documents stream in, each batch is
chunked (sliding token windows), hash-embedded (vocabulary-free), and
ingested into the streaming IVF index — the freshly-arrived corpus is
immediately searchable. Every stage is an already-pinned operator;
this test pins the COMPOSITION: search results over the streamed index
equal the same chunk→embed→IVF pipeline run in one batch pass."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import time

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.ann_index import build_ivf_index
from flink_application_spark.operators.similarity import ivf_topk, train_centroids
from flink_application_spark.plans.chunk_queries import chunk_windows
from flink_application_spark.plans.vectorize_queries import hashing_trick_features
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.ann_ingest import IVFIngest


def _chunk_vectors(docs):
    """doc stream → chunk windows → 32-dim hashed chunk vectors with a
    stable chunk id (doc_id * 1000 + chunk_idx)."""
    chunks = chunk_windows(docs).select(
        (F.col("doc_id") * 1000 + F.col("chunk_idx")).alias("chunk_id"),
        F.col("chunk_text"),
    )
    return hashing_trick_features(
        chunks, text_col="chunk_text", id_col="chunk_id"
    ).select(F.col("chunk_id").alias("vec_id"), "embedding")


def test_streamed_rag_intake_is_searchable(spark, sf_dir, tmp_path):
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]

    # batch reference: the full chunk→embed corpus and its IVF results
    corpus = _chunk_vectors(docs).filter(F.col("embedding").isNotNull()).cache()
    cents = train_centroids(corpus, n_centroids=8)
    queries = corpus.filter(F.col("vec_id") < 5000)  # chunks of docs 0-4
    want = {
        tuple(r)
        for r in ivf_topk(queries, corpus, k=5, n_probe=3, centroids=cents).collect()
    }

    # streaming: docs arrive in 2 waves; each batch chunks + embeds +
    # ingests into the persisted index (frozen centroids)
    idx = str(tmp_path / "ivf")
    build_ivf_index(corpus.limit(1), idx, centroids=cents)
    src = tmp_path / "in"
    for part in range(2):
        docs.filter(F.col("doc_id") % 2 == part).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        time.sleep(1.2)

    ing = IVFIngest(idx)

    def intake(batch_df, batch_id):
        ing.process_batch(_chunk_vectors(batch_df), batch_id)

    q = (
        file_stream(spark, str(src), max_files_per_trigger=1)
        .writeStream.foreachBatch(intake)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        tuple(r) for r in ing.query(spark, queries, k=5, n_probe=3).collect()
    }
    assert got == want and len(want) > 0
    corpus.unpersist()
