"""Re-aggregatable distinct-count sketches (Apache DataSketches HLL,
exposed by Spark as ``hll_sketch_agg`` / ``hll_union_agg``).

This is the 100 TB cardinality shape: build a tiny sketch PER PARTITION
SLICE (here per event-type × day), persist/ship the sketches, and
re-aggregate by UNION — rollups over any dimension subset without
re-scanning the raw events. A plain ``approx_count_distinct`` answers
one query; a sketch TABLE answers every rollup after one corpus pass
(the sketch column is mergeable state, same philosophy as the
streaming heavy-hitters' additive count-min partials).

Estimates are engine-specific (DataSketches internals), so the query is
rows-only at the driver gate; `tests/test_sketches.py` pins the
estimate within HLL's published error bounds against the exact
distinct count and proves union-merge == direct-sketch on the union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.plans.registry import register


def daily_user_sketches(events: DataFrame) -> DataFrame:
    """(event_type, day, sketch, n_rows): one HLL sketch of user_id per
    type × day slice — the mergeable building block."""
    return (
        events.select(
            "event_type", F.to_date("ts").alias("day"), "user_id"
        )
        .groupBy("event_type", "day")
        .agg(
            F.hll_sketch_agg("user_id").alias("sketch"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def rollup_sketches(daily: DataFrame) -> DataFrame:
    """Union-merge the daily sketches up to per-type totals — no
    re-scan of the raw table, just sketch state."""
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users"),
            F.sum("n_rows").alias("n_rows"),
            F.count(F.lit(1)).alias("n_days"),
        )
    )


@register(
    "events_hll_user_rollup",
    None,  # DataSketches estimates are engine-specific — bounds pinned in pytest
    doc="Mergeable HLL distinct-user rollup: per (event_type, day) "
    "sketches built in ONE events pass, union-aggregated to per-type "
    "totals. The sketch table is the scale artifact — any dimensional "
    "rollup afterwards merges kilobyte sketches instead of re-scanning "
    "100 TB. Estimate accuracy and merge-equals-direct pinned in "
    "tests/test_sketches.py.",
    tags=("events", "sketch", "approx"),
)
def q_hll_user_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = register_views(spark, sf_dir, tables=("events",))["events"]
    return rollup_sketches(daily_user_sketches(events)).select(
        "event_type",
        F.col("est_users").cast("bigint").alias("est_users"),
        "n_rows",
        "n_days",
    )
