"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``flink_application_spark.plans.*`` and register
themselves into ``plans.registry.REGISTRY``; this module is a thin
adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from flink_application_spark.plans import registry as _registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full CDR enrichment
    pipeline (Path A lookup-join union Path B as-of join + dedup),
    re-expressed Spark-first from the reference EnrichmentApp."""
    spec = _registry.REGISTRY_GET("cdr_enrichment_full")
    return spec.spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return _registry.all_oracles()
