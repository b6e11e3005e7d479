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


def test_one_upstream_execution_for_ntile(spark):
    """Round-6 verdict item: global_ntile must not re-run its upstream
    for the N count, and consuming the result must not re-run it
    either (the pinned frame is the correctness fix too — re-executed
    repartitionByRange can re-sample different boundaries and mismatch
    the collected offsets). The accumulator counts upstream row
    evaluations: the build itself costs at most 2 passes (the range
    sampler + the shuffle write — inherent to repartitionByRange), and
    NOTHING after the build adds to it."""
    n = 200
    acc = spark.sparkContext.accumulator(0)

    def tick(x):
        acc.add(1)
        return x

    tick_udf = F.udf(tick, "bigint")
    df = (
        spark.range(n)
        .withColumn("id", tick_udf("id"))
        .select(
            "id",
            (F.col("id") % 17).alias("v"),
            F.md5(F.col("id").cast("string")).alias("t"),
        )
    )
    order = [F.col("v").asc(), F.col("t").asc()]
    out = global_ntile(df, order, 4, "bucket")
    built = acc.value
    assert n <= built <= 2 * n, built
    assert out.count() == n
    out.collect()
    assert acc.value == built  # consumption reads the pinned blocks


def test_broadcast_offsets_bit_equal_at_2048_partitions(spark):
    """Past twophase.LITERAL_BASE_MAX partitions the base offsets
    attach via broadcast join (a create_map literal would inline one
    expression pair per partition — megabytes of plan at cluster
    partition counts). Same output, BroadcastHashJoin in the plan."""
    df = _frame(spark, 4000)
    order = [F.col("v").asc(), F.col("t").asc()]
    lit_path = {r.id: r.rn for r in global_row_number(df, order, "rn").collect()}
    bj = global_row_number(df, order, "rn", n_partitions=2048)
    assert "BroadcastHashJoin" in bj._jdf.queryExecution().toString()
    assert {r.id: r.rn for r in bj.collect()} == lit_path


def test_ntile_broadcast_path_matches_window(spark):
    df = _frame(spark, 503)
    order = [F.col("v").asc(), F.col("t").asc()]
    got = {
        r.id: r.bucket
        for r in global_ntile(df, order, 7, "bucket", literal_max=0).collect()
    }
    want = {
        r.id: r.bucket
        for r in df.withColumn(
            "bucket", F.ntile(7).over(Window.orderBy(*order))
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
