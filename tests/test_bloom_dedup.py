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


def test_registered_params_on_driver_corpus(spark):
    docs = load_table(spark, SF, "documents")
    rows = bloom_dedup_frame(docs).collect()
    assert len(rows) == docs.filter("text IS NOT NULL").count()
    for r in rows:
        assert r["bloom_dup"] >= r["exact_dup"]
        assert r["false_positive"] == r["bloom_dup"] - r["exact_dup"]
