"""Error-bound properties of the sketch aggregates (no cross-engine
oracle exists for HLL++/KLL internals — the bound IS the contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_application_spark.plans.registry import REGISTRY_GET


def test_approx_sketches_within_bounds(spark, sf_dir):
    got = {
        r.l_returnflag: r
        for r in REGISTRY_GET("agg_approx_sketches").spark(spark, sf_dir).collect()
    }
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for flag, row in got.items():
        e = exact[flag]
        # HLL++ with rsd=1% — allow 5% (5 sigma-ish)
        assert abs(row.approx_orders - e.orders) <= max(0.05 * e.orders, 2)
        assert abs(row.approx_parts - e.parts) <= max(0.05 * e.parts, 2)
        # quantiles ordered and within the observed value range
        assert row.price_p50 <= row.price_p95
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    for row in got.values():
        assert lo <= row.price_p50 <= hi
        assert lo <= row.price_p95 <= hi
