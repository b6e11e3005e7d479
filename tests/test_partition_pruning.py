"""Hive-style partition pruning on the partitioned parquet sink layout
(SURVEY §4: sink partitioning exists to make downstream scans prune)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_partitioned_layout_prunes_scan(spark, sf_dir, tmp_path):
    out = str(tmp_path / "by_flag")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    li.write.partitionBy("l_returnflag").parquet(out)

    df = spark.read.parquet(out).filter(F.col("l_returnflag") == "R")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the partition predicate must be a PartitionFilter on the scan
    # (pruned at file listing), not a post-scan Filter
    assert "PartitionFilters" in plan
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "l_returnflag" in pf_line
    want = li.filter(F.col("l_returnflag") == "R").count()
    assert df.count() == want
