"""Incremental rollup maintenance: converges to the from-scratch
aggregate, and single-day updates leave every other partition's files
untouched on disk."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import os

from pyspark.sql import functions as F

from flink_application_spark.catalog import load_table
from flink_application_spark.streaming.incremental import (
    full_daily_order_rollup,
    upsert_daily_order_rollup,
)


def _snapshot(path: str) -> dict[str, tuple]:
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(root, f)
                st = os.stat(p)
                out[p] = (st.st_size, st.st_mtime_ns)
    return out


def test_incremental_equals_full_recompute(spark, sf_dir, tmp_path):
    agg = str(tmp_path / "rollup")
    orders = load_table(spark, sf_dir, "orders")

    # three arbitrary interleaved batches (late data included: batches
    # are NOT date-disjoint, so merges genuinely combine)
    for i in range(3):
        n = upsert_daily_order_rollup(
            spark, agg, orders.filter(F.col("o_orderkey") % 3 == i)
        )
        assert n > 0

    got = {
        str(r["day"]): (r["n_orders"], r["revenue_cents"])
        for r in spark.read.parquet(agg).collect()
    }
    want = {
        r["day"]: (r["n_orders"], r["revenue_cents"])
        for r in full_daily_order_rollup(orders).collect()
    }
    assert got == want


def test_incremental_touches_only_affected_partitions(spark, sf_dir, tmp_path):
    agg = str(tmp_path / "rollup")
    orders = load_table(spark, sf_dir, "orders")
    upsert_daily_order_rollup(spark, agg, orders)

    some_day = str(spark.read.parquet(agg).select(F.min("day")).first()[0])
    before = _snapshot(agg)

    late = orders.limit(0).unionByName(
        spark.createDataFrame(
            [(99999901, 1, "O", 1234.56, f"{some_day} 00:00:00", "1-URGENT")],
            "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
            "o_totalprice double, o_orderdate string, o_orderpriority string",
        ).withColumn("o_orderdate", F.col("o_orderdate").cast("timestamp_ntz"))
    )
    assert upsert_daily_order_rollup(spark, agg, late) == 1

    after = _snapshot(agg)
    changed_dirs = {
        os.path.dirname(p)
        for p in set(before) ^ set(after)
        | {p for p in before.keys() & after.keys() if before[p] != after[p]}
    }
    assert changed_dirs == {os.path.join(agg, f"day={some_day}")}

    # and the merged day is the sum of old + late
    row = (
        spark.read.parquet(agg).filter(F.col("day") == some_day).first()
    )
    old = full_daily_order_rollup(orders).filter(F.col("day") == some_day).first()
    assert row["n_orders"] == old["n_orders"] + 1
    assert row["revenue_cents"] == old["revenue_cents"] + 123456
