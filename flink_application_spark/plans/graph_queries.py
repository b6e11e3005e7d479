"""Graph-centrality query over the near-dup similarity graph.

PageRank on the verified LSH pair graph ranks each document by how
central it is to its duplication neighborhood — the most-connected
member of a boilerplate family is the best canonical representative
(and the strongest removal signal for the rest). Composes the existing
near-dup machinery (`verified_near_dup_pairs`) with the iterative
`operators/graph.py:pagerank` loop.

Rows-only at the driver gate (iterative float aggregation is not
bit-reproducible in SQL); `tests/test_graph.py` pins the semantics
against a dense numpy PageRank on the same edges, plus the Σ rank = 1
invariant the dangling-mass redistribution guarantees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.graph import pagerank
from flink_application_spark.operators.minhash import verified_near_dup_pairs
from flink_application_spark.plans.dedup_queries import NEAR_DUP_THRESHOLD
from flink_application_spark.plans.registry import register


@register(
    "doc_simgraph_pagerank",
    None,  # iterative float fixpoint — numpy-pinned in tests, rows-only here
    doc="PageRank over the verified near-dup pair graph (damping 0.85, "
    "15 rounds): per-round cost is one rank×edge join + one sum "
    "aggregate, lineage-truncated per round. Ranks the canonical "
    "representative of each boilerplate family; Σ rank = 1 exactly "
    "(dangling mass redistributed).",
    tags=("documents", "graph", "dedup"),
)
def q_simgraph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    pairs = verified_near_dup_pairs(docs, threshold=NEAR_DUP_THRESHOLD)
    pr = pagerank(pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")))
    return pr.select(F.col("id").alias("doc_id"), F.round("rank", 6).alias("rank"))
