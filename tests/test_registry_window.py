"""The driver's correctness gate samples the FIRST 50 registered
queries. plans.registry._load_all orders imports deliberately so that
window covers every §2-mapped surface plus the newest oracle-bearing
queries; this test pins that design against accidental import-order
or module-membership changes.

The check runs in a FRESH subprocess: within a pytest run, other test
modules import plans modules directly (a legitimate thing for a unit
test to do), which registers those queries first in THIS process and
scrambles the order — but the driver always enters through
`_load_all` in a clean interpreter, so a clean interpreter is what the
guard must model."""

from __future__ import annotations

import functools
import json
import pathlib
import subprocess
import sys

from flink_application_spark.plans.registry import REGISTRY, _load_all

# Round-7 window contract: the non-negotiables are the four round-7
# rows-only → oracle-EXACT conversions (the driver must hash-check
# them) and the consumers of the two-phase scan rewrite (the full
# window is pinned exactly by
# test_first_50_is_exactly_the_curated_window).
MUST_BE_IN_WINDOW = {
    # round-7 rows-only → oracle conversions (verdict item 4)
    "emb_mmr_diversified_topk",
    "emb_mmr_diversified_topk_ann",
    "emb_contrastive_triplets_ann",
    "doc_text_search_topk_ann",
    "events_cep_funnel_matches",
    "events_cep_error_burst_recovery",
    "events_cep_clean_checkout",
    # two-phase scan rewrite consumers (ranks/packing/export)
    "vocab_gini_concentration",
    "doc_curriculum_buckets",
    "customer_rfm_segmentation",
    "doc_epoch_shuffle_shards",
    "corpus_shard_manifest",
    "corpus_pack_spans",
    "corpus_pack_stats",
    # the exact counterpart of the mine_triplets refactor
    "emb_contrastive_triplets",
    # round-7 additions: deterministic mergeable HLL + exact-integer
    # Lloyd's / power-iteration / PageRank, all oracle-exact
    "events_hll_det_rollup",
    "emb_kmeans_fit_exact_profile",
    "emb_pca_power_exact",
    "doc_simgraph_pagerank_exact",
}


# Driver-sampled union audit: every name in the round-1/round-2
# correctness files that is NOT re-sampled this round keeps its green
# evidence only if it still exists under the same name — pinned by
# test_no_duplicate_or_renamed_registrations below.


@functools.lru_cache(maxsize=1)
def _canonical_first_50() -> tuple[str, ...]:
    out = subprocess.run(
        [
            sys.executable,
            "-c",
            "from flink_application_spark.plans.registry import REGISTRY, _load_all;"
            "import json; _load_all(); print(json.dumps(list(REGISTRY)[:50]))",
        ],
        capture_output=True,
        text=True,
        check=True,
        cwd=str(pathlib.Path(__file__).resolve().parents[1]),
    )
    return tuple(json.loads(out.stdout.strip().splitlines()[-1]))


def test_critical_queries_inside_sample_window():
    first_50 = _canonical_first_50()
    missing = MUST_BE_IN_WINDOW - set(first_50)
    assert not missing, (
        f"{missing} fell outside the driver's first-50 sample window — "
        "check SAMPLE_WINDOW in plans.registry"
    )


def test_first_50_is_exactly_the_curated_window():
    from flink_application_spark.plans.registry import SAMPLE_WINDOW

    assert list(_canonical_first_50()) == SAMPLE_WINDOW


def test_no_duplicate_or_renamed_registrations():
    """Names are the driver's correctness keys — they must be unique
    (enforced at register()) and the core set must never be renamed."""
    _load_all()
    assert len(REGISTRY) == len(set(REGISTRY))
    assert MUST_BE_IN_WINDOW <= set(REGISTRY)


def test_previously_sampled_queries_still_registered():
    """Rotating the window only extends coverage if every query the
    driver ALREADY sampled green keeps existing under the same name —
    a rename or deletion silently forfeits its recorded evidence."""
    root = pathlib.Path(__file__).resolve().parents[1]
    sampled: set[str] = set()
    for f in root.glob("CORRECTNESS_r*.json"):
        sampled |= set(json.loads(f.read_text()))
    _load_all()
    missing = sampled - set(REGISTRY)
    assert not missing, f"previously driver-sampled queries vanished: {missing}"
