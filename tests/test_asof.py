"""Unit tests for the applyInPandas merge_asof operator — edge cases
the oracle queries don't isolate (left-join nulls, right-only keys,
exact-timestamp inclusivity, tie-breaking)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_application_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [
            ("k1", "2024-01-01 10:00:00", 1),
            ("k1", "2024-01-01 12:00:00", 2),
            ("k2", "2024-01-01 10:00:00", 3),  # key with no right rows
            ("k3", "2024-01-01 09:00:00", 4),  # before every right row
        ],
        "k string, ts string, lval int",
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            ("k1", "2024-01-01 09:00:00", 100),
            ("k1", "2024-01-01 11:00:00", 200),
            ("k1", "2024-01-01 12:00:00", 300),  # exactly == left ts → included
            ("k3", "2024-01-01 10:00:00", 400),  # after the only left row
            ("k4", "2024-01-01 00:00:00", 500),  # right-only key
        ],
        "k string, rts string, rval int",
    ).withColumn("rts", F.to_timestamp("rts"))
    return left, right.select(F.col("k").alias("rk"), "rts", "rval")


def test_asof_inner(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, [("k", "rk")], "ts", "rts", ["rval"], how="inner"
    )
    got = {(r.k, r.lval, r.rval) for r in out.collect()}
    # k1@10:00 → 09:00 row; k1@12:00 → the == 12:00 row (inclusive backward)
    assert got == {("k1", 1, 100), ("k1", 2, 300)}


def test_asof_left(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, [("k", "rk")], "ts", "rts", ["rval"], how="left")
    got = {(r.k, r.lval, r.rval) for r in out.collect()}
    assert got == {
        ("k1", 1, 100),
        ("k1", 2, 300),
        ("k2", 3, None),  # no right rows for the key
        ("k3", 4, None),  # right rows exist but all later
    }


def test_asof_tiebreak_max_payload(spark):
    left = spark.createDataFrame(
        [("k", "2024-01-01 10:00:00", 1)], "k string, ts string, lval int"
    ).withColumn("ts", F.to_timestamp("ts"))
    right = spark.createDataFrame(
        [
            ("k", "2024-01-01 09:00:00", 5),
            ("k", "2024-01-01 09:00:00", 9),  # same ts → larger payload wins
        ],
        "k string, rts string, rval int",
    ).withColumn("rts", F.to_timestamp("rts")).select(
        F.col("k").alias("rk"), "rts", "rval"
    )
    out = asof_join(left, right, [("k", "rk")], "ts", "rts", ["rval"])
    assert [r.rval for r in out.collect()] == [9]


def test_asof_rejects_bad_how(spark):
    left, right = _frames(spark)
    import pytest

    with pytest.raises(ValueError):
        asof_join(left, right, [("k", "rk")], "ts", "rts", ["rval"], how="full")
