"""Recursive-CTE surface contracts: UNION-distinct still unsupported
(the DAG-only caveat the query documents), and depth growth bounded."""

from __future__ import annotations

import pytest


def test_union_distinct_still_unsupported(spark):
    """plans/recursive_queries.py documents DAG-only recursion because
    Spark rejects UNION inside WITH RECURSIVE. If this starts passing,
    cyclic closures become expressible — update the module."""
    with pytest.raises(Exception, match="UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE"):
        spark.sql(
            "WITH RECURSIVE r(n) AS (SELECT 1 UNION SELECT n FROM r) SELECT * FROM r"
        ).collect()


def test_recursion_depth_matches_log2(spark, sf_dir):
    from flink_application_spark.plans.registry import REGISTRY_GET

    rows = {
        r["custkey"]: r["depth_to_root"]
        for r in REGISTRY_GET("customer_tree_depth_recursive_cte")
        .spark(spark, sf_dir)
        .collect()
    }
    for k, d in rows.items():
        assert d == max(k, 1).bit_length() - 1, (k, d)
