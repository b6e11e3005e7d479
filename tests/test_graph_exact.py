"""Exact-integer PageRank (operators/graph_exact.py): parity with a
pure-Python integer reference, closeness to the float operator at
equal rounds, bit-determinism under repartitioning, empty-graph edge
case."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.graph import pagerank
from flink_application_spark.operators.graph_exact import (
    DAMP_PCT,
    TOTAL,
    pagerank_exact,
)
from flink_application_spark.operators.minhash import verified_near_dup_pairs


def _edges(spark, sf_dir):
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    return verified_near_dup_pairs(docs, threshold=0.5).select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    )


def _py_reference(pairs: list[tuple[int, int]], iters: int) -> dict[int, int]:
    eu = set()
    for a, b in pairs:
        eu.add((a, b))
        eu.add((b, a))
    verts = sorted({v for e in eu for v in e})
    n = len(verts)
    deg: dict[int, int] = {}
    for s, _ in eu:
        deg[s] = deg.get(s, 0) + 1
    base = ((100 - DAMP_PCT) * TOTAL) // (100 * n)
    rank = {v: TOTAL // n for v in verts}
    for _ in range(iters):
        inflow = {v: 0 for v in verts}
        for s, d in eu:
            inflow[d] += rank[s] // deg[s]
        rank = {v: base + (DAMP_PCT * inflow[v]) // 100 for v in verts}
    return rank


def test_matches_python_integer_reference(spark, sf_dir):
    edges = _edges(spark, sf_dir)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    want = _py_reference(pairs, iters=12)
    got = {r.id: r.rank for r in pagerank_exact(edges, iters=12).collect()}
    assert got == want  # EXACT — integer arithmetic end to end


def test_close_to_float_pagerank_at_equal_rounds(spark, sf_dir):
    edges = _edges(spark, sf_dir)
    fl = {r.id: r.rank for r in pagerank(edges, iters=12).collect()}
    ex = {r.id: r.rank for r in pagerank_exact(edges, iters=12).collect()}
    assert set(fl) == set(ex)
    s = sum(ex.values())
    for v, r in fl.items():
        assert abs(ex[v] / s - r) < 1e-6, v  # truncation drain is ~1e-12/round


def test_bit_determinism_under_repartitioning(spark, sf_dir):
    edges = _edges(spark, sf_dir)
    a = sorted(tuple(r) for r in pagerank_exact(edges, iters=6).collect())
    b = sorted(
        tuple(r) for r in pagerank_exact(edges.repartition(13), iters=6).collect()
    )
    assert a == b


def test_empty_graph(spark):
    df = spark.createDataFrame([], "src bigint, dst bigint")
    assert pagerank_exact(df, iters=3).count() == 0
