"""PageRank pinned against a dense numpy reference (same damping,
same dangling-mass redistribution, same round count)."""

from __future__ import annotations

import numpy as np
import pytest

from flink_application_spark.operators.graph import pagerank


def _np_pagerank(n, edges, d=0.85, iters=15):
    """edges: directed (src, dst) list over 0..n-1."""
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangling = r[out_deg == 0].sum()
        inflow = np.zeros(n)
        for s, t in edges:
            inflow[t] += r[s] / out_deg[s]
        r = (1 - d) / n + d * dangling / n + d * inflow
    return r


def _ranks(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_matches_numpy_directed_with_dangling(spark):
    # 0→1, 0→2, 1→2; vertex 2 is dangling (no out-edges)
    edges = [(0, 1), (0, 2), (1, 2)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = _ranks(pagerank(df, undirected=False, iters=15))
    want = _np_pagerank(3, edges, iters=15)
    assert got.keys() == {0, 1, 2}
    for i in range(3):
        assert got[i] == pytest.approx(want[i], abs=1e-12)


def test_undirected_mirrors_edges_and_sums_to_one(spark):
    df = spark.createDataFrame([(1, 2), (2, 3), (10, 11)], "src: long, dst: long")
    got = _ranks(pagerank(df, undirected=True, iters=10))
    both = [(1, 2), (2, 1), (2, 3), (3, 2), (10, 11), (11, 10)]
    ids = sorted(got)
    want = _np_pagerank(5, [(ids.index(s), ids.index(t)) for s, t in both], iters=10)
    for k, i in ((v, ids.index(v)) for v in ids):
        assert got[k] == pytest.approx(want[i], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_star_center_dominates(spark):
    # star: hub 0 connected to 1..5; hub must get the top rank
    df = spark.createDataFrame([(0, i) for i in range(1, 6)], "src: long, dst: long")
    got = _ranks(pagerank(df, undirected=True, iters=15))
    assert max(got, key=got.get) == 0
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_empty_graph_returns_empty_frame(spark):
    df = spark.createDataFrame([], "src: long, dst: long")
    out = pagerank(df)
    assert out.columns == ["id", "rank"] and out.count() == 0
