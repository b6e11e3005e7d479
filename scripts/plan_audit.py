"""Physical-plan audit across the whole query registry.

For every registered query, prints one line of plan-health metrics:

- n_exchange: shuffle count (Exchange operators, minus reused ones)
- n_bhj / n_smj / n_nlj: join strategy mix (broadcast-hash /
  sort-merge / broadcast-nested-loop)
- wsc: WholeStageCodegen span count (bigger spans = more of the plan
  stays JVM-compiled). NOTE: under AQE the codegen annotation (and the
  final join strategy) only exists after execution — pass --execute to
  run each query and audit the FINAL adaptive plan instead of the
  initial one
- pushed: whether any parquet scan reports a non-empty PushedFilters
- reused: ReusedExchange count (AQE sharing work between subtrees)

Usage: python scripts/plan_audit.py [sf_dir] [name_substring] [--execute]

This is the at-a-glance audit for "is there a shuffle here that
becomes the bottleneck at 100×" — read it next to SCALE.md.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_application_spark.plans.registry import REGISTRY, _load_all
from flink_application_spark.session import get_spark


def audit_plan(plan: str) -> dict:
    """String-based audit (legacy; kept for the `pushed` flag and as a
    cross-check). CAVEAT the physical walk below exists to fix: plan
    toString RE-PRINTS a persisted subtree at every InMemoryTableScan
    referencing it, so a funnel that scans one cached frame 50 times
    reads as 50× its true exchange count (round-5 verdict:
    corpus_curation_funnel printed exch=306)."""
    return {
        "n_exchange": len(re.findall(r"\bExchange\b", plan))
        - len(re.findall(r"\bReusedExchange\b", plan)),
        "n_bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "n_smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "n_nlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", plan)),
        # codegen stages print as "*(N) Op" in plan strings — count
        # distinct stage ids (literal "WholeStageCodegen" only appears
        # in the formatted explain)
        "wsc": len({m for m in re.findall(r"\*\((\d+)\)", plan)}),
        "pushed": "PushedFilters: [" in plan
        and bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "reused": len(re.findall(r"\bReusedExchange\b", plan)),
    }


def physical_counts(jplan) -> dict:
    """Count operators by walking the PHYSICAL tree — each plan node
    counts exactly once, however many times toString would print it.

    - a persisted subtree (InMemoryRelation.cachedPlan) is visited
      once per DISTINCT relation (structural equality — the same
      semantics Spark's cache manager dedupes by), not once per scan;
    - AQE wrappers are transparent: AdaptiveSparkPlanExec descends
      into its final plan (initial plan when never executed),
      QueryStageExec wrappers into their materialized subtree;
    - ReusedExchange/ReusedSubquery are counted as `reused` and not
      descended (their target was counted at its original site);
    - scalar-subquery plans hang off node.subqueries(), visited once
      per owning node.
    """
    counts = {
        "n_exchange": 0,
        "n_bhj": 0,
        "n_smj": 0,
        "n_nlj": 0,
        "n_cartesian": 0,
        "wsc": 0,
        "reused": 0,
    }
    seen_cached: list = []  # JVM InMemoryRelation handles (equals() dedupe)

    def visit(node) -> None:
        cls = node.getClass().getSimpleName()
        if cls == "AdaptiveSparkPlanExec":
            for meth in ("finalPhysicalPlan", "executedPlan", "initialPlan"):
                try:
                    visit(getattr(node, meth)())
                    return
                except Exception:  # noqa: BLE001  (not yet executed)
                    continue
            return
        if cls.endswith("QueryStageExec"):
            visit(node.plan())
            return
        if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
            counts["reused"] += 1
            return
        if cls == "ShuffleExchangeExec":
            counts["n_exchange"] += 1
        elif cls == "BroadcastHashJoinExec":
            counts["n_bhj"] += 1
        elif cls == "SortMergeJoinExec":
            counts["n_smj"] += 1
        elif cls == "BroadcastNestedLoopJoinExec":
            counts["n_nlj"] += 1
        elif cls == "CartesianProductExec":
            counts["n_cartesian"] += 1
        elif cls == "WholeStageCodegenExec":
            counts["wsc"] += 1
        elif cls == "InMemoryTableScanExec":
            rel = node.relation()
            if not any(rel.equals(r) for r in seen_cached):
                seen_cached.append(rel)
                visit(rel.cachedPlan())
            return
        ch = node.children()
        for i in range(ch.size()):
            visit(ch.apply(i))
        try:
            sq = node.subqueries()
            for i in range(sq.size()):
                visit(sq.apply(i))
        except Exception:  # noqa: BLE001
            pass

    visit(jplan)
    return counts


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--execute"]
    execute = "--execute" in sys.argv[1:]
    sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    needle = args[1] if len(args) > 1 else ""
    spark = get_spark("plan-audit")
    _load_all()
    rows = []
    for name, spec in sorted(REGISTRY.items()):
        if needle and needle not in name:
            continue
        try:
            df = spec.spark(spark, sf_dir)
            if execute:
                # collect() finalizes THIS df's AdaptiveSparkPlan (a
                # .write would spawn a separate QueryExecution)
                df.collect()
            jplan = df._jdf.queryExecution().executedPlan()
            plan = jplan.toString()
            m = physical_counts(jplan)
        except Exception as e:  # noqa: BLE001
            print(f"{name:45s} ERROR {e}")
            continue
        m["pushed"] = audit_plan(plan)["pushed"]
        rows.append((name, m))
        print(
            f"{name:45s} exch={m['n_exchange']:2d} bhj={m['n_bhj']:2d} "
            f"smj={m['n_smj']:2d} nlj={m['n_nlj']:2d} "
            f"cart={m['n_cartesian']:2d} wsc={m['wsc']:2d} "
            f"reused={m['reused']:2d} pushed={'y' if m['pushed'] else '-'}"
        )
    tot = len(rows)
    if tot:
        print(
            f"\n{tot} queries | avg exchanges "
            f"{sum(r[1]['n_exchange'] for r in rows) / tot:.1f} | "
            f"SMJ-bearing {sum(1 for r in rows if r[1]['n_smj'])} | "
            f"NLJ-bearing {sum(1 for r in rows if r[1]['n_nlj'])}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
