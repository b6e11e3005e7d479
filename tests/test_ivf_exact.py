"""Exact-TRAINED IVF retrieval (`operators/ivf_exact.py`): the index
whose training, assignment, probing, and ranking are all exact-integer
and oracle-replayable. Oracle parity (Spark == DuckDB value hash) is
covered by tests/test_oracle_parity.py; here the retrieval CONTRACTS:
full probe must equal the integer brute force exactly, partial probe
must beat a recall floor on the fixture, and everything must be
bit-deterministic under repartitioning."""

from __future__ import annotations

import numpy as np
import pytest

from flink_application_spark.operators.ivf_exact import ivf_exact_trained_topk

_SF = "/root/testdata/sf0.001"
_K = 10


def _emb(spark):
    from flink_application_spark.catalog import register_views

    return register_views(spark, _SF, tables=("embeddings",))["embeddings"]


@pytest.fixture(scope="module")
def exact_reference(spark):
    """Integer brute-force top-k per query — ppm quantization identical
    to quantize_ppm, ties (d2, vec_id) ascending."""
    rows = (
        _emb(spark)
        .filter("embedding IS NOT NULL")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    x = np.round(np.array([r["embedding"] for r in rows], dtype=np.float64) * 1e6)

    def topk(qid: int, k: int = _K) -> list[int]:
        qi = int(np.where(ids == qid)[0][0])
        d2 = ((x - x[qi]) ** 2).sum(axis=1)
        order = sorted(
            (int(d2[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != qid
        )
        return [v for _, v in order[:k]]

    return topk


def _ranked(df) -> dict[int, list[int]]:
    out: dict[int, list[tuple[int, int]]] = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    return {q: [v for _, v in sorted(rs)] for q, rs in out.items()}


def test_full_probe_equals_integer_brute_force(spark, exact_reference):
    """Probing every cell removes the approximation entirely: the
    trained-index ranking must equal the exact integer ranking — not
    approximately, exactly (same d2 fold, same tie-break)."""
    got = _ranked(ivf_exact_trained_topk(_emb(spark), k=_K, n_probe=8))
    assert set(got) == set(range(5))
    for q in range(5):
        assert got[q] == exact_reference(q), q


def test_partial_probe_recall_floor(spark, exact_reference):
    """nprobe=2 of 8 trained cells. Measured recall@10 on this fixture:
    0.7–0.9 per query (mean 0.86) — trained centroids partition even
    this isotropic corpus usefully for L2, well above the 0.25
    probe-fraction floor a random partition would give. Pin 0.6/query
    and 0.75 mean with headroom under the measurement."""
    got = _ranked(ivf_exact_trained_topk(_emb(spark), k=_K, n_probe=2))
    recalls = [
        len(set(got[q]) & set(exact_reference(q))) / _K for q in range(5)
    ]
    assert min(recalls) >= 0.6, recalls
    assert sum(recalls) / len(recalls) >= 0.75, recalls


def test_bit_deterministic_under_repartitioning(spark):
    emb = _emb(spark)
    a = sorted(map(tuple, ivf_exact_trained_topk(emb.repartition(32), k=_K).collect()))
    b = sorted(map(tuple, ivf_exact_trained_topk(emb.coalesce(1), k=_K).collect()))
    assert a == b  # exact equality — training, probing, and ranking


def test_output_contract(spark):
    df = ivf_exact_trained_topk(_emb(spark), k=_K)
    assert df.columns == ["query_id", "vec_id", "d2q", "rank"]
    rows = df.collect()
    assert all(r["rank"] <= _K for r in rows)
    assert all(r["query_id"] != r["vec_id"] for r in rows)
    assert all(r["d2q"] >= 0 for r in rows)


def test_empty_input_returns_empty_frame(spark):
    empty = spark.createDataFrame([], "vec_id bigint, embedding array<float>")
    df = ivf_exact_trained_topk(empty, k=_K)
    assert df.columns == ["query_id", "vec_id", "d2q", "rank"]
    assert df.count() == 0
