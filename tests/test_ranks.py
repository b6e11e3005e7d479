"""Two-phase global rank/ntile (operators/ranks.py): bit-equal to the
single-task window forms, invariant under input partitioning."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from flink_application_spark.operators.ranks import global_ntile, global_row_number


def _frame(spark, n=500):
    # deliberately tied-looking values with a unique tie-break column
    return spark.range(n).select(
        F.col("id"),
        (F.col("id") % 17).alias("v"),
        F.md5(F.col("id").cast("string")).alias("t"),
    )


def test_global_row_number_matches_window(spark):
    df = _frame(spark)
    order = [F.col("v").desc(), F.col("t").asc()]
    got = {
        r.id: r.rn for r in global_row_number(df, order, "rn").collect()
    }
    want = {
        r.id: r.rn
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_partitioning_invariance(spark):
    df = _frame(spark)
    order = [F.col("v").asc(), F.col("t").asc()]
    a = {r.id: r.rn for r in global_row_number(df, order, "rn").collect()}
    b = {
        r.id: r.rn
        for r in global_row_number(df.repartition(13), order, "rn").collect()
    }
    assert a == b


def test_global_ntile_matches_window(spark):
    df = _frame(spark, n=503)  # non-divisible: exercises the remainder split
    order = [F.col("v").asc(), F.col("t").asc()]
    for n_buckets in (4, 7, 10):
        got = {
            r.id: r.bucket
            for r in global_ntile(df, order, n_buckets, "bucket").collect()
        }
        want = {
            r.id: r.bucket
            for r in df.withColumn(
                "bucket", F.ntile(n_buckets).over(Window.orderBy(*order))
            ).collect()
        }
        assert got == want, n_buckets


def test_ntile_fewer_rows_than_buckets(spark):
    df = _frame(spark, n=3)
    order = [F.col("v").asc(), F.col("t").asc()]
    got = {
        r.id: r.bucket for r in global_ntile(df, order, 10, "bucket").collect()
    }
    want = {
        r.id: r.bucket
        for r in df.withColumn(
            "bucket", F.ntile(10).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_no_global_window_in_plan(spark):
    """The whole point: the two-phase form must NOT plan a
    partition-less window (the doctor's GLOBAL_WINDOW error)."""
    from flink_application_spark.doctor import diagnose

    df = _frame(spark)
    ranked = global_row_number(df, [F.col("v").asc(), F.col("t").asc()], "rn")
    assert "GLOBAL_WINDOW" not in {f.code for f in diagnose(ranked)}
