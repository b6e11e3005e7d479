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

import json
import subprocess
import sys

from flink_application_spark.plans.registry import REGISTRY, _load_all

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


def _canonical_first_50() -> list[str]:
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
        cwd="/root/repo",
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_critical_queries_inside_sample_window():
    first_50 = _canonical_first_50()
    missing = MUST_BE_IN_WINDOW - set(first_50)
    assert not missing, (
        f"{missing} fell outside the driver's first-50 sample window — "
        "check import order in plans.registry._load_all"
    )


def test_no_duplicate_or_renamed_registrations():
    """Names are the driver's correctness keys — they must be unique
    (enforced at register()) and the core set must never be renamed."""
    _load_all()
    assert len(REGISTRY) == len(set(REGISTRY))
    assert MUST_BE_IN_WINDOW <= set(REGISTRY)
