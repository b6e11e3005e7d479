"""RRF hybrid search: fusion properties and plan shape."""

from __future__ import annotations

from flink_application_spark.plans.registry import REGISTRY_GET


def test_rrf_properties(spark, sf_dir):
    rows = REGISTRY_GET("doc_hybrid_rrf_search").spark(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert all(
        a.rrf_score >= b.rrf_score for a, b in zip(by_rank, by_rank[1:])
    )
    # both-list members must dominate single-list members of equal rank:
    # 1/(60+r) + 1/(60+s) > 1/(60+r) for any finite s
    both = [r for r in rows if r.bm25_rank > 0 and r.sem_rank > 0]
    only_bm = [r for r in rows if r.bm25_rank > 0 and r.sem_rank == 0]
    for b in both:
        for o in only_bm:
            if o.bm25_rank >= b.bm25_rank:
                assert b.rrf_score > o.rrf_score


def test_rrf_no_cartesian(spark, sf_dir):
    plan = (
        REGISTRY_GET("doc_hybrid_rrf_search")
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
