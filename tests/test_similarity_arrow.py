"""Arrow brute-force scoring must be BIT-IDENTICAL to the JVM fold
form — same left-to-right accumulation order, same IEEE division,
same HALF_UP round, NaN→NULL for null/ragged embeddings. The fold
form is the arithmetic reference (same pattern as the kmeans/pq
fold-vs-arrow pins)."""

from __future__ import annotations

import pytest

from flink_application_spark.catalog import load_table
from flink_application_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_fold,
)

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(
        (r["query_id"], r["vec_id"], r["cosine"], r["rank"]) for r in df.collect()
    )


def test_arrow_equals_fold_on_driver_embeddings(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(emb.vec_id < 8)
    assert _rows(brute_force_topk(q, emb, k=7)) == _rows(
        brute_force_topk_fold(q, emb, k=7)
    )


def test_arrow_equals_fold_with_null_and_ragged_embeddings(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),
        (2, None),
        (3, [0.0, 1.0]),  # ragged: dim 2 vs 3
        (4, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    q = df.filter(df.vec_id.isin(0, 2))
    got = _rows(brute_force_topk(q, df, k=4))
    want = _rows(brute_force_topk_fold(q, df, k=4))
    assert got == want
    # the NULL-query and NULL/ragged-corpus pairs must be NULL, not NaN
    nulls = [t for t in got if t[2] is None]
    assert nulls, "expected NULL cosines for the null-embedding query"


def test_topk_rank_and_tiebreak(spark):
    # two corpus vectors exactly tied in cosine → lower vec_id first
    rows = [
        (10, [1.0, 0.0]),
        (11, [1.0, 0.0]),
        (12, [1.0, 0.0]),
        (13, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    q = df.filter(df.vec_id == 10)
    got = _rows(brute_force_topk(q, df, k=2))
    assert got == [(10, 11, pytest.approx(1.0), 1), (10, 12, pytest.approx(1.0), 2)]
