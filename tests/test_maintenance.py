"""Small-file compaction: row-preserving, file-count-targeted, and
range-clustered (non-overlapping per-file sort-key intervals)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_application_spark.operators.maintenance import (
    compact_parquet,
    file_range_stats,
)


def test_compaction_rows_files_and_ranges(spark, tmp_path):
    src = str(tmp_path / "fragmented")
    dst = str(tmp_path / "compacted")

    # simulate a streaming sink's fragmentation: 64 tiny files
    spark.range(10_000).withColumn("k", F.col("id") % 997).repartition(
        64
    ).write.parquet(src)
    assert len(spark.read.parquet(src).inputFiles()) >= 64

    n_parts = compact_parquet(
        spark, src, dst, sort_cols=["id"], target_rows_per_file=2_500
    )
    assert n_parts == 4

    out = spark.read.parquet(dst)
    # row-preserving (same multiset)
    assert out.count() == 10_000
    assert out.select(F.sum("id")).first()[0] == sum(range(10_000))
    # file count collapsed to ~target
    assert len(out.inputFiles()) <= 8

    # range clustering: per-file [min,max] of the sort key do not overlap
    stats = file_range_stats(spark, dst, "id").orderBy("min_val").collect()
    assert all(s.n_rows > 0 for s in stats)
    for prev, cur in zip(stats, stats[1:]):
        assert prev.max_val < cur.min_val
