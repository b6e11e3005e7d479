"""The driver's correctness gate samples the FIRST 50 registered
queries. plans.registry._load_all orders imports deliberately so that
window covers every §2-mapped surface plus the newest oracle-bearing
queries; this test pins that design against accidental import-order
or module-membership changes."""

from __future__ import annotations

from flink_application_spark.plans.registry import REGISTRY, _load_all

_load_all()
_FIRST_50 = list(REGISTRY)[:50]

# §2-mapped queries that had only local oracle evidence in round 1 —
# the whole point of plans/reference_ops.py is keeping these sampled.
MUST_BE_IN_WINDOW = {
    "cdr_src_extended",
    "cdr_enrichment_full",
    "cdr_enrich_path_a",
    "cdr_enrich_path_b",
    "cdr_enrich_path_b_asof",
    "scalar_function_library",   # §2 P12
    "events_latest_per_user",    # §2 W2
    # round-2 additions that have never been driver-sampled
    "doc_jaccard_similarity_join",
    "emb_pca_gram",
    "emb_cosine_near_dup_pairs",
    "emb_dup_components",
}


def test_critical_queries_inside_sample_window():
    missing = MUST_BE_IN_WINDOW - set(_FIRST_50)
    assert not missing, (
        f"{missing} fell outside the driver's first-50 sample window — "
        "check import order in plans.registry._load_all"
    )


def test_no_duplicate_or_renamed_registrations():
    """Names are the driver's correctness keys — they must be unique
    (enforced at register()) and the core set must never be renamed."""
    assert len(REGISTRY) == len(set(REGISTRY))
    assert MUST_BE_IN_WINDOW <= set(REGISTRY)
