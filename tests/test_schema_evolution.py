"""Schema evolution on the partitioned parquet sink: a long-running
ingestion adds columns over time; readers must see the union schema
with NULLs for pre-evolution files, and pushdown must still work on
the evolved column."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_added_column_reads_as_null_for_old_files(spark, tmp_path):
    out = str(tmp_path / "t")
    spark.range(5).select(F.col("id"), F.lit("a").alias("v")).write.mode(
        "append"
    ).parquet(out)
    # generation 2 adds a quality-score column
    spark.range(5, 10).select(
        F.col("id"), F.lit("b").alias("v"), (F.col("id") * 1.0).alias("score")
    ).write.mode("append").parquet(out)

    df = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(df.columns) == {"id", "v", "score"}
    assert df.count() == 10
    # old files surface NULL for the new column, not an error
    assert df.filter(F.col("score").isNull()).count() == 5
    # filters on the evolved column behave (NULL rows drop out)
    assert df.filter(F.col("score") >= 7.0).count() == 3


def test_evolved_column_filter_pushdown(spark, tmp_path):
    out = str(tmp_path / "t")
    spark.range(100).select(F.col("id")).write.mode("append").parquet(out)
    spark.range(100, 200).select(
        F.col("id"), (F.col("id") % 7).alias("bucket")
    ).write.mode("append").parquet(out)
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(out)
        .filter(F.col("bucket") == 3)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "bucket" in plan
    assert df.count() == 15  # only generation-2 rows can match
