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


def test_zorder_cluster_skips_on_both_dimensions(spark, tmp_path):
    from flink_application_spark.operators.maintenance import (
        files_containing,
        zorder_cluster,
    )

    src = str(tmp_path / "grid")
    linear = str(tmp_path / "linear")
    zordered = str(tmp_path / "zordered")

    # 256x256 grid of (x, y) points, randomly laid out on disk
    spark.range(65536).select(
        (F.col("id") % 256).alias("x"), (F.col("id") / 256).cast("long").alias("y")
    ).repartition(16).write.parquet(src)

    # baseline: range-clustered on x only
    compact_parquet(spark, src, linear, sort_cols=["x"], target_rows_per_file=4096)
    n = zorder_cluster(
        spark, src, zordered, x_col="x", y_col="y", bits=8, target_rows_per_file=4096
    )
    assert n == 16

    out = spark.read.parquet(zordered)
    assert out.count() == 65536
    assert out.select(F.sum("x"), F.sum("y")).first() == spark.read.parquet(
        src
    ).select(F.sum("x"), F.sum("y")).first()

    # x-sorted layout: every file spans all of y -> a y point predicate
    # touches every file; the Z-order layout must touch at most half
    # the files on y AND stay selective on x (maxRecordsPerFile may
    # split uneven range partitions, so compare against actual counts)
    n_linear = len(spark.read.parquet(linear).inputFiles())
    n_z = len(out.inputFiles())
    y_linear = files_containing(spark, linear, "y", 17)
    y_z = files_containing(spark, zordered, "y", 17)
    x_z = files_containing(spark, zordered, "x", 17)
    assert y_linear == n_linear
    assert y_z <= n_z / 2, (y_z, n_z)
    assert x_z <= n_z / 2, (x_z, n_z)


def test_expire_partitions_drops_only_old(spark, tmp_path):
    from flink_application_spark.operators.maintenance import expire_partitions

    path = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.col("id"),
        F.date_format(
            F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 10).cast("int")),
            "yyyy-MM-dd",
        ).alias("event_date"),
    )
    df.write.partitionBy("event_date").parquet(path)
    assert spark.read.parquet(path).select("event_date").distinct().count() == 10

    dropped = expire_partitions(
        spark, path, partition_col="event_date", keep_from="2024-01-04"
    )
    assert dropped == ["2024-01-01", "2024-01-02", "2024-01-03"]

    left = spark.read.parquet(path)
    assert left.select("event_date").distinct().count() == 7
    assert left.filter(F.col("event_date") < "2024-01-04").count() == 0
    assert left.count() == 70
