"""Streaming heavy-hitters: merged-sketch estimates never undercount,
planted heavy keys are recovered across batches, replay is additive-
safe (the property a mergeable sketch dies without)."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pytest
from pyspark.sql import functions as F

from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.heavy_hitters import HeavyHitters


@pytest.fixture()
def skewed_stream_dir(spark, tmp_path):
    """Three batches of a Zipf-ish key stream: 'hot1' and 'hot2'
    dominate globally; a long tail of singletons per batch."""
    src = tmp_path / "in"
    for part in range(3):
        rows = (
            [("hot1",)] * 120
            + [("hot2",)] * 80
            + [("warm",)] * 20
            + [(f"tail{part}_{i}",) for i in range(200)]
        )
        spark.createDataFrame(rows, "user string").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    return src


def _truth(spark, src):
    return {
        r.user: r.n
        for r in spark.read.parquet(str(src))
        .groupBy("user")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_heavy_hitters_end_to_end(spark, skewed_stream_dir, tmp_path):
    hh = HeavyHitters(str(tmp_path / "state"), key_col="user")
    q = hh.attach(
        file_stream(spark, str(skewed_stream_dir), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    truth = _truth(spark, skewed_stream_dir)
    top = {r.key: r.estimate for r in hh.topk(spark, k=3).collect()}
    # the global heavies are recovered, in order
    assert set(top) == {"hot1", "hot2", "warm"}
    # CMS one-sided error: estimate >= true count, for every candidate
    for k, est in top.items():
        assert est >= truth[k], (k, est, truth[k])
    # merged-sketch totals equal the stream length (additivity)
    per_row = (
        hh.sketch(spark).groupBy("row").agg(F.sum("c").alias("n")).collect()
    )
    n_events = sum(truth.values())
    assert all(r.n == n_events for r in per_row)


def test_replay_does_not_double_count(spark, skewed_stream_dir, tmp_path):
    hh = HeavyHitters(str(tmp_path / "state"), key_col="user")
    batch = spark.read.parquet(str(skewed_stream_dir)).limit(300)
    hh.process_batch(batch, 0)
    before = {r.key: r.estimate for r in hh.topk(spark, k=5).collect()}
    hh.process_batch(batch, 0)  # crash-replay: overwrite, not add
    after = {r.key: r.estimate for r in hh.topk(spark, k=5).collect()}
    assert after == before


def test_compaction_preserves_sketch_and_replay(spark, skewed_stream_dir, tmp_path):
    """Folding committed batch partitions into one consolidated partial
    leaves every estimate unchanged, and a LIVE batch can still replay
    (its partition is untouched)."""
    from flink_application_spark.streaming.sinks import compact_batches

    hh = HeavyHitters(str(tmp_path / "state"), key_col="user")
    q = hh.attach(
        file_stream(spark, str(skewed_stream_dir), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    before_top = [(r.key, r.estimate) for r in hh.topk(spark, k=3).collect()]
    cells_dir = hh._cells_dir
    n = compact_batches(
        spark,
        cells_dir,
        min_live_batch=2,  # batches 0,1 committed; batch 2 stays live
        combine={"c": "sum"},
        group_cols=("row", "bucket"),
    )
    assert n == 2
    import glob
    import os

    parts = sorted(os.path.basename(p) for p in glob.glob(f"{cells_dir}/_batch=*"))
    assert parts == ["_batch=-3", "_batch=2"]
    assert [(r.key, r.estimate) for r in hh.topk(spark, k=3).collect()] == before_top

    # live-batch replay still overwrites its own partition only
    last_wave = sorted(
        skewed_stream_dir.glob("*.parquet"), key=os.path.getmtime
    )[-1]
    hh.process_batch(spark.read.parquet(str(last_wave)), 2)
    assert [(r.key, r.estimate) for r in hh.topk(spark, k=3).collect()] == before_top
