"""Bloom dedup audit invariants.

The Bloom guarantee is NO false negatives: every exact duplicate must
be flagged, at any (m, k) — even an adversarially tiny filter. False
positives are allowed and are exactly bloom_dup − exact_dup.
"""

from __future__ import annotations

from flink_application_spark.catalog import load_table
from flink_application_spark.plans.bloom_queries import bloom_dedup_frame

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "pack my box with five dozen jugs"),
        (2, "THE QUICK BROWN FOX  "),  # exact dup of 0 after canon
        (3, "sphinx of black quartz"),
        (4, "pack my box with five dozen jugs"),  # exact dup of 1
        (5, None),  # NULL text: excluded entirely
        (6, "lorem ipsum dolor sit amet"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string")


def test_exact_dups_always_flagged_even_on_tiny_filter(spark):
    # m = 8 saturates instantly → plenty of false positives, but the
    # no-false-negative guarantee must still hold
    got = {r["doc_id"]: r for r in bloom_dedup_frame(_corpus(spark), m=8).collect()}
    assert 5 not in got  # NULL text excluded
    assert got[2]["exact_dup"] == 1 and got[2]["bloom_dup"] == 1
    assert got[4]["exact_dup"] == 1 and got[4]["bloom_dup"] == 1
    for r in got.values():
        assert r["bloom_dup"] >= r["exact_dup"]  # exact ⊆ bloom
        assert r["false_positive"] == r["bloom_dup"] - r["exact_dup"]


def test_first_occurrence_never_exact_dup_and_large_filter_is_exact(spark):
    # m = 2^20 with 7 docs: collision probability is negligible and the
    # md5 hash is fixed, so bloom == exact deterministically
    got = {r["doc_id"]: r for r in bloom_dedup_frame(_corpus(spark), m=1 << 20).collect()}
    assert got[0]["exact_dup"] == 0 and got[0]["bloom_dup"] == 0
    assert got[1]["exact_dup"] == 0 and got[1]["bloom_dup"] == 0
    for r in got.values():
        assert r["bloom_dup"] == r["exact_dup"]
        assert r["false_positive"] == 0


def test_sizing_meets_measured_fpr_on_driver_corpus(spark):
    """size_bloom_for_fpr's (m, k) must achieve, on the REAL corpus,
    a measured false-positive rate no worse than ~2× the target (the
    expected-value curve has variance at finite n; 2× is the standard
    acceptance band for a single draw)."""
    from flink_application_spark.plans.bloom_queries import (
        bloom_fpr,
        size_bloom_for_fpr,
    )

    docs = load_table(spark, "/root/testdata/sf0.01", "documents")
    n = docs.filter("text IS NOT NULL").count()
    m, k = size_bloom_for_fpr(n, target_fpr=0.01)
    assert bloom_fpr(n, m, k) <= 0.01
    rows = bloom_dedup_frame(docs, m=m, k=k).collect()
    new_docs = [r for r in rows if r["exact_dup"] == 0]
    fps = sum(r["false_positive"] for r in new_docs)
    assert fps / max(len(new_docs), 1) <= 0.02


def test_sizing_monotone_and_bounds():
    from flink_application_spark.plans.bloom_queries import (
        bloom_fpr,
        size_bloom_for_fpr,
    )

    m1, k1 = size_bloom_for_fpr(10_000, 0.01)
    m2, k2 = size_bloom_for_fpr(10_000, 0.001)
    assert m2 >= m1 and (m2 & (m2 - 1)) == 0  # tighter target → bigger power-of-2
    assert k1 >= 1 and k2 >= 1
    # the curve itself: more keys at fixed (m, k) can only hurt
    assert bloom_fpr(20_000, m1, k1) >= bloom_fpr(10_000, m1, k1)


def test_registered_params_on_driver_corpus(spark):
    docs = load_table(spark, SF, "documents")
    rows = bloom_dedup_frame(docs).collect()
    assert len(rows) == docs.filter("text IS NOT NULL").count()
    for r in rows:
        assert r["bloom_dup"] >= r["exact_dup"]
        assert r["false_positive"] == r["bloom_dup"] - r["exact_dup"]
