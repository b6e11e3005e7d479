"""Default-tier plan-quality canary (round-9 ADVICE item 3).

The registry-wide plan audit (`tests/test_plan_quality.py`) lives in
the slow tier — ~6 min for ~250 queries. That left the per-commit
loop with NO plan-shape net: a cartesian or NLJ regression would only
surface in the slow tier / per-round PLAN_AUDIT sweep. This module is
the cheap canary: the same cartesian/NLJ/exchange-ceiling guard over
just the driver's SAMPLE_WINDOW (the 50 queries the next correctness
gate will run — exactly the rows that must not regress this round).
Plan construction only, no execution; the registry-wide sweep stays
in the slow tier.
"""

from __future__ import annotations

import pathlib
import sys

import pytest

from flink_application_spark.plans import registry
from flink_application_spark.plans.registry import SAMPLE_WINDOW

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# shared allow-lists — one source of truth in the slow-tier module
from tests.test_plan_quality import (  # noqa: E402
    INTENTIONALLY_QUADRATIC,
    PHYSICAL_EXCHANGE_CEILING,
    SCALAR_SUBQUERY_BROADCAST,
)


@pytest.mark.parametrize("name", SAMPLE_WINDOW)
def test_sample_window_plan_canary(spark, sf_dir, name):
    from scripts.plan_audit import physical_counts

    df = registry.REGISTRY_GET(name).spark(spark, sf_dir)
    counts = physical_counts(df._jdf.queryExecution().executedPlan())
    assert counts["n_exchange"] <= PHYSICAL_EXCHANGE_CEILING, (
        f"{name} plans {counts['n_exchange']} physical shuffles "
        f"(ceiling {PHYSICAL_EXCHANGE_CEILING})"
    )
    if name in INTENTIONALLY_QUADRATIC:
        return
    assert counts["n_cartesian"] == 0, f"{name} plans a cartesian product"
    if name in SCALAR_SUBQUERY_BROADCAST:
        assert counts["n_nlj"] <= SCALAR_SUBQUERY_BROADCAST[name]
        return
    assert counts["n_nlj"] == 0, f"{name} degraded to nested-loop join"
