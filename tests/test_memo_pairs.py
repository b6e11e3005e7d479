"""The shared near-dup pair memo (round-11 verdict item 7): the
gate-only dedup consumers (doc_dedup_canonical_near,
doc_dedup_keep_best_quality, doc_dup_components,
corpus_source_contamination_matrix) derive their pair set from ONE
session-scoped verified_near_dup_pairs run instead of four. Default
tier — two sf0.001 LSH pipelines, seconds."""

from __future__ import annotations

from flink_application_spark.catalog import register_views
from flink_application_spark.plans import _memo


def test_near_dup_pairs_memo_matches_inline_and_builds_once(spark, sf_dir):
    from flink_application_spark.operators.minhash import (
        verified_near_dup_pairs,
    )

    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    got = _memo.near_dup_pairs_cached(spark, docs, sf_dir, 0.5)
    again = _memo.near_dup_pairs_cached(spark, docs, sf_dir, 0.5)
    assert got is again  # memo hit — one pipeline per session/key
    want = verified_near_dup_pairs(docs, threshold=0.5)
    g = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in got.collect())
    w = sorted((r["id_a"], r["id_b"], r["jaccard"]) for r in want.collect())
    assert g == w and len(g) > 0


def test_near_dup_components_memo_matches_inline(spark, sf_dir):
    from flink_application_spark.operators.components import (
        connected_components,
    )
    from flink_application_spark.operators.minhash import (
        verified_near_dup_pairs,
    )

    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    got = _memo.near_dup_components_cached(spark, docs, sf_dir, 0.5)
    again = _memo.near_dup_components_cached(spark, docs, sf_dir, 0.5)
    assert got is again  # memo hit — one CC loop per session/key
    want = connected_components(
        verified_near_dup_pairs(docs, threshold=0.5),
        vertices=docs, src="id_a", dst="id_b", vertex_col="doc_id",
    )
    g = sorted((r["v"], r["component"]) for r in got.collect())
    w = sorted((r["v"], r["component"]) for r in want.collect())
    assert g == w and len(g) > 0
