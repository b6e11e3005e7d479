"""AQE skew-join handling — the runtime re-plan this repo's 100 TB
design leans on for skewed keys must actually fire.

The salting pattern (salted_agg_lineitem) is the EXPLICIT skew tool;
AQE skew-join is the implicit one: at execution time Spark splits a
skewed sort-merge partition into subpartitions and replicates the
other side. This test pins that the session's AQE config really
produces a `skew=true` join on a 90%-one-key corpus, so the claim
"skewed keys → salting or AQE" is measured, not assumed. Thresholds
are lowered to test scale and restored afterwards.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_TUNED = {
    # force the sort-merge path (the skew machinery is SMJ-only)
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    # recognize test-sized partitions as skewed
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8k",
    # coalescing can merge the split partitions right back at this size
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_aqe_splits_skewed_join_partition(spark):
    saved = {k: spark.conf.get(k, None) for k in _TUNED}
    try:
        for k, v in _TUNED.items():
            spark.conf.set(k, v)
        # 60k-row fact: 90% of rows share key 0 (pathological hot key),
        # joined to a 100-row dim on the skewed column
        fact = spark.range(60_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(0))
            .otherwise(F.col("id") % 100)
            .alias("k"),
            F.md5(F.col("id").cast("string")).alias("payload"),
        )
        dim = spark.range(100).select(
            F.col("id").alias("k"), F.lit("dim").alias("tag")
        )
        joined = fact.join(dim, "k")
        # collect() (not count()) so THIS DataFrame's queryExecution is
        # the one AQE finalizes — count() builds a separate query tree
        # and this plan would stay an un-executed initial plan
        assert len(joined.collect()) == 60_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
