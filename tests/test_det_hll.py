"""Deterministic mergeable HLL (operators/hll.py): register/rank
parity with a pure-Python reference, merge == direct table equality,
and estimate accuracy against exact distinct counts."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from flink_application_spark.operators.hll import (
    M,
    RANK_CAP,
    det_hll_estimate,
    det_hll_sketch,
    merge_sketches,
    register_and_rank,
)


def _py_register_rank(value: str) -> tuple[int, int]:
    h = hashlib.md5(value.encode()).hexdigest()
    register = int(h[:3], 16)
    bits = bin(int(h[3:16], 16))[2:].zfill(52)
    lz = len(bits) - len(bits.lstrip("0"))
    return register, min(lz + 1, RANK_CAP)


def test_register_rank_matches_python_reference(spark):
    df = spark.range(2000).select(F.col("id").cast("string").alias("v"))
    reg, rank = register_and_rank(F.col("v"))
    got = {
        r["v"]: (r["register"], r["rank"])
        for r in df.select("v", reg.alias("register"), rank.alias("rank")).collect()
    }
    for v, pair in got.items():
        assert pair == _py_register_rank(v), v
    # the rank distribution must actually exercise multi-bit runs
    assert max(r for _, r in got.values()) >= 8


def test_merge_equals_direct(spark):
    df = spark.range(30_000).select(
        (F.col("id") % 2).alias("half"),
        F.lit("g").alias("grp"),
        F.col("id").cast("string").alias("v"),
    )
    direct = det_hll_sketch(df, "v", ["grp"])
    halves = det_hll_sketch(df, "v", ["grp", "half"])
    merged = merge_sketches(halves.drop("half"), ["grp"])
    a = sorted(tuple(r) for r in direct.collect())
    b = sorted(tuple(r) for r in merged.collect())
    assert a == b  # max-merge is exact — same table, not "close"
    # and therefore identical estimates
    ea = det_hll_estimate(direct, ["grp"]).collect()[0]
    eb = det_hll_estimate(merged, ["grp"]).collect()[0]
    assert ea == eb


def test_estimate_within_hll_error_bounds(spark):
    # rsd = 1.04/sqrt(4096) ≈ 1.6%; allow 3 sigma ≈ 5%
    for n in (500, 5_000, 50_000):
        df = spark.range(n).select(
            F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
        )
        est = det_hll_estimate(
            det_hll_sketch(df, "v", ["grp"]), ["grp"]
        ).collect()[0]["est_users"]
        assert abs(est - n) / n < 0.05, (n, est)


def test_small_range_linear_counting_kicks_in(spark):
    # tiny cardinalities land in the linear-counting branch and must
    # still be accurate (raw HLL overestimates badly below 2.5m)
    df = spark.range(25).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
    )
    est = det_hll_estimate(
        det_hll_sketch(df, "v", ["grp"]), ["grp"]
    ).collect()[0]
    assert est["n_registers"] <= 25
    assert abs(est["est_users"] - 25) < 2


def test_sketch_rows_bounded_by_registers(spark):
    # state is at most m rows per group regardless of input size
    df = spark.range(200_000).select(
        F.lit("g").alias("grp"), F.col("id").cast("string").alias("v")
    )
    assert det_hll_sketch(df, "v", ["grp"]).count() <= M
