"""Bucketed (pre-shuffled) tables for co-located joins.

At 100 TB the dominant cost of a fact-fact equi-join is the shuffle of
both sides. Bucketing materializes that shuffle ONCE at write time:
each side is hash-partitioned into N buckets on the join key and
sorted within buckets, so every later join on that key is a zero-
exchange sort-merge join — Catalyst sees matching `HashPartitioning`
output from both scans and elides both Exchange nodes (and with
`sortBy`, the per-bucket sort too).

This is the batch analogue of the reference's pre-exploded dimension
materialization (EnrichmentAppWithoutExplode.java:253-273 — denormalize
once in the store so the per-event work stays cheap): trade one-time
write cost for every-query read savings.

Operational notes for cluster scale:
- bucket count is fixed at write time; choose it for the TARGET scale
  (buckets ≈ total cores × small multiple). Too few → giant tasks.
- both join sides must have the SAME bucket count (Spark joins
  mismatched counts by re-shuffling the smaller-bucketed side).
- bucket pruning applies to equality filters on the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    buckets: int,
    key: str,
    sort: bool = True,
) -> None:
    """Materialize `df` as an external bucketed table `name` at `path`,
    hash-bucketed (and optionally sorted) on `key`."""
    writer = df.write.bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.option("path", path).mode("overwrite").saveAsTable(name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on, how: str = "inner"
) -> DataFrame:
    """Join two registered bucketed tables; with matching bucket specs
    on the join key this plans with zero Exchange nodes."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
