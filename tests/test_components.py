"""connected_components unit tests.

The long-chain case is the regression the sf0.1 sweep caught: plain
neighbor-min propagation needs O(diameter) rounds, and a 200-vertex
path graph blew past max_iter=25. Pointer jumping must collapse it in
O(log diameter) rounds.
"""

from __future__ import annotations

from flink_application_spark.operators.components import connected_components


def _comp(df):
    return {r["v"]: r["component"] for r in df.collect()}


def test_long_chain_converges_within_log_rounds(spark):
    # path graph 0-1-2-...-199: diameter 199 >> max_iter
    edges = [(i, i + 1) for i in range(199)]
    df = spark.createDataFrame(edges, "src: long, dst: long")
    got = _comp(connected_components(df, max_iter=25))
    assert got == {i: 0 for i in range(200)}


def test_two_components_and_isolated_vertex(spark):
    edges = spark.createDataFrame(
        [(5, 3), (3, 9), (20, 21)], "src: long, dst: long"
    )
    verts = spark.createDataFrame(
        [(v,) for v in (3, 5, 9, 20, 21, 42)], "id: long"
    )
    got = _comp(connected_components(edges, vertices=verts))
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 42: 42}


def test_component_label_is_min_reachable_id(spark):
    # triangle plus a pendant; min id 1 must label all four
    edges = spark.createDataFrame(
        [(7, 4), (4, 1), (1, 7), (7, 8)], "src: long, dst: long"
    )
    got = _comp(connected_components(edges))
    assert got == {1: 1, 4: 1, 7: 1, 8: 1}
