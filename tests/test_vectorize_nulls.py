"""hashing_trick_features must match the HOF reference form on the
edge rows the corpus tests can't reach (NULL text, empty text)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_application_spark.plans.vectorize_queries import (
    hashing_trick_embedding,
    hashing_trick_features,
)


def test_null_and_empty_text_parity_with_hof_form(spark):
    docs = spark.createDataFrame(
        [(1, "hello world hello"), (2, None), (3, ""), (4, "   ")],
        "doc_id: long, text: string",
    )
    hof = {
        r["doc_id"]: r["e"]
        for r in docs.select(
            "doc_id", hashing_trick_embedding(F.col("text")).alias("e")
        ).collect()
    }
    df_form = {
        r["doc_id"]: r["embedding"]
        for r in hashing_trick_features(docs).collect()
    }
    assert df_form[2] is None and hof[2] is None  # NULL text → NULL embedding
    for k in (1, 3, 4):
        assert df_form[k] == hof[k], (k, df_form[k], hof[k])
