"""Plan doctor — static advisories on an executed Spark plan.

`scripts/plan_audit.py` counts what a plan DOES; this module says what
is WRONG with it and what to do instead. Each detector encodes one
failure mode this repo has actually hit and fixed (citations in each
finding), so the advice is remediation that worked, not lint
folklore. Run it on any DataFrame during development:

    from flink_application_spark.doctor import diagnose
    for f in diagnose(df):
        print(f.severity, f.code, f.message)

or over the whole registry: ``python scripts/plan_doctor.py [sf_dir]``.

Detectors (all tree-walk based — the plan-STRING re-prints persisted
subtrees and lies about counts, see plan_audit.physical_counts):

- CARTESIAN: CartesianProductExec anywhere — O(n·m) row explosion.
- NESTED_LOOP: BroadcastNestedLoopJoin — legitimate ONLY as a 1-row
  scalar-subquery append; anything larger is a missing equi-key.
- GLOBAL_WINDOW: a window/sort with an EMPTY partition spec moves
  every row to one task (the "No Partition Defined for Window"
  warning, made inspectable). The two-phase prefix sum in
  operators/packing.py is the standard fix.
- UNPUSHED_FILTER: a Filter directly above a parquet scan that
  reports no pushed filters — predicate pushdown failed (usually a
  non-deterministic/UDF-wrapped predicate or a cast mismatch).
- HOF_IN_SCAN_FILTER: zip_with/aggregate( machinery inside a
  pre-exchange Filter condition — Catalyst's inferred IsNotNull can
  inline a derived column's ENTIRE defining expression into the
  (often single-task) scan stage; doc_simhash_near_dup_pairs paid
  533 s vs ~10 s for this before a persist() barrier fixed it.
- SHUFFLE_BUDGET: physical ShuffleExchange count above a caller-set
  ceiling (default matches tests/test_plan_quality.py's 32).

The doctor reports; it never mutates. Severities: "error" = will not
survive scale-up, "warn" = needs a reason (this repo allowlists its
known-legitimate cases in tests/test_plan_quality.py).
"""

from __future__ import annotations

import re
from dataclasses import dataclass


@dataclass
class Finding:
    code: str
    severity: str  # "error" | "warn"
    message: str


def _walk(node, visit, seen_cached=None):
    """Same traversal contract as plan_audit.physical_counts: descend
    AQE and query-stage wrappers, visit persisted subtrees once per
    distinct relation, treat Reused* as leaves."""
    if seen_cached is None:
        seen_cached = []
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        for meth in ("finalPhysicalPlan", "executedPlan", "initialPlan"):
            try:
                _walk(getattr(node, meth)(), visit, seen_cached)
                return
            except Exception:  # noqa: BLE001
                continue
        return
    if cls.endswith("QueryStageExec"):
        _walk(node.plan(), visit, seen_cached)
        return
    if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
        return
    visit(node, cls)
    if cls == "InMemoryTableScanExec":
        rel = node.relation()
        if not any(rel.equals(r) for r in seen_cached):
            seen_cached.append(rel)
            _walk(rel.cachedPlan(), visit, seen_cached)
        return
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), visit, seen_cached)
    try:
        sq = node.subqueries()
        for i in range(sq.size()):
            _walk(sq.apply(i), visit, seen_cached)
    except Exception:  # noqa: BLE001
        pass


_PASS_THROUGH = {
    "InputAdapter",
    "WholeStageCodegenExec",
    "ColumnarToRowExec",
    "BatchEvalPythonExec",
    "ArrowEvalPythonExec",
    "ProjectExec",
}


def _scan_below(node):
    """The FileSourceScanExec reachable from `node` through
    pass-through operators only (None if a join/agg/exchange/other
    real operator intervenes, or at a branch)."""
    while True:
        ch = node.children()
        if ch.size() != 1:
            return None
        node = ch.apply(0)
        cls = node.getClass().getSimpleName()
        if cls == "FileSourceScanExec":
            return node
        if cls not in _PASS_THROUGH:
            return None


_BOUNDING = (
    "HashAggregateExec",
    "SortAggregateExec",
    "ObjectHashAggregateExec",
    "CollectLimitExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "TakeOrderedAndProjectExec",
)

_ROW_SOURCES = ("FileSourceScanExec", "RangeExec", "InMemoryTableScanExec")


def _reaches_raw_source(node) -> bool:
    """True iff a row source (scan/range/cache) is reachable below
    `node` WITHOUT passing an aggregate or limit — i.e. the operator
    sees corpus-sized input, not a bounded/aggregated frame."""
    cls = node.getClass().getSimpleName()
    if cls in _BOUNDING:
        return False
    if cls in _ROW_SOURCES:
        return True
    if cls == "AdaptiveSparkPlanExec":
        for meth in ("finalPhysicalPlan", "executedPlan", "initialPlan"):
            try:
                return _reaches_raw_source(getattr(node, meth)())
            except Exception:  # noqa: BLE001
                continue
        return False
    if cls.endswith("QueryStageExec"):
        return _reaches_raw_source(node.plan())
    if cls in ("ReusedExchangeExec", "ReusedSubqueryExec"):
        return False
    ch = node.children()
    return any(_reaches_raw_source(ch.apply(i)) for i in range(ch.size()))


def diagnose(df, *, shuffle_ceiling: int = 32) -> list[Finding]:
    findings: list[Finding] = []
    n_exchange = 0

    def visit(node, cls):
        nonlocal n_exchange
        if cls == "CartesianProductExec":
            findings.append(
                Finding(
                    "CARTESIAN",
                    "error",
                    "CartesianProduct: every left row pairs with every "
                    "right row. Add an equi-key (bucket/band/block the "
                    "join the way operators/minhash|similarity do) or "
                    "broadcast + range-block (operators/rangejoin).",
                )
            )
        elif cls == "BroadcastNestedLoopJoinExec":
            findings.append(
                Finding(
                    "NESTED_LOOP",
                    "warn",
                    "BroadcastNestedLoopJoin: fine iff the build side is "
                    "a 1-row aggregate (scalar-subquery append); anything "
                    "larger means a missing equi-key. See "
                    "SCALAR_SUBQUERY_BROADCAST in tests/test_plan_quality.py.",
                )
            )
        elif cls in ("WindowExec", "WindowGroupLimitExec"):
            try:
                empty = node.partitionSpec().isEmpty()
            except Exception:  # noqa: BLE001
                empty = False
            if empty:
                # corpus-sized single task only if RAW rows reach the
                # window; a global rank over an already-aggregated /
                # limited frame (vocab slopes, per-source rankings) is
                # bounded by construction
                raw = _reaches_raw_source(node)
                findings.append(
                    Finding(
                        "GLOBAL_WINDOW",
                        "error" if raw else "warn",
                        "Window with no PARTITION BY "
                        + (
                            "over RAW rows: the whole input moves to ONE "
                            "task. Partition the window, use orderBy+limit "
                            "(TakeOrdered), or compute prefix aggregates "
                            "two-phase (operators/packing.py)."
                            if raw
                            else "over an aggregated/limited frame: single "
                            "task, but bounded by the upstream aggregate — "
                            "verify the group-key cardinality stays small."
                        ),
                    )
                )
        elif cls == "FilterExec":
            try:
                cond = node.condition().toString()
            except Exception:  # noqa: BLE001
                cond = ""
            if "zip_with" in cond or "aggregate(" in cond:
                findings.append(
                    Finding(
                        "HOF_IN_SCAN_FILTER",
                        "warn",
                        "Interpreted higher-order fold inside a Filter "
                        "condition: Catalyst likely inlined a derived "
                        "column's defining expression below the exchange "
                        "(IsNotNull inference). Insert a persist() barrier "
                        "after deriving the column — the "
                        "doc_simhash_near_dup_pairs fix (533 s → ~10 s).",
                    )
                )
            # unpushed predicate above a parquet scan, with only
            # pass-through operators in between (codegen adapters,
            # projections, Python eval stages — the UDF-predicate case)
            try:
                scan = _scan_below(node)
                if scan is not None:
                    s = scan.toString()
                    if "PushedFilters: []" in re.sub(r"\s+", " ", s):
                        findings.append(
                            Finding(
                                "UNPUSHED_FILTER",
                                "warn",
                                "Filter sits directly above a parquet scan "
                                "that pushed NOTHING: the predicate never "
                                "reached the reader (UDF/non-deterministic "
                                "expression, or a casted column). Rewrite "
                                "the predicate over raw columns so "
                                "PushedFilters is non-empty.",
                            )
                        )
            except Exception:  # noqa: BLE001
                pass
        elif cls == "ShuffleExchangeExec":
            n_exchange += 1

    _walk(df._jdf.queryExecution().executedPlan(), visit)
    if n_exchange > shuffle_ceiling:
        findings.append(
            Finding(
                "SHUFFLE_BUDGET",
                "warn",
                f"{n_exchange} physical shuffles (> {shuffle_ceiling}): "
                "look for repeated re-aggregation of the same frame "
                "(persist the shared subtree) or per-round loops missing "
                "localCheckpoint.",
            )
        )
    return findings
