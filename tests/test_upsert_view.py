"""Streaming materialized upsert view: convergence to the batch merge
of the full log, replay idempotence, time travel, vacuum."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import time

from flink_application_spark.operators.merge import apply_changelog
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.upsert_view import UpsertView

SCHEMA = "k: long, seq: long, op: string, name: string, v: long"


def _write(spark, src, rows, mode="append"):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(mode).parquet(str(src))
    time.sleep(1.2)  # distinct modTimes → deterministic batch order


def _rows(df):
    return {(r["k"], r["name"], r["v"]) for r in df.collect()}


WAVES = [
    [(1, 1, "I", "a", 10), (2, 2, "I", "b", 20)],
    [(1, 3, "U", "a2", 11), (3, 4, "I", "c", 30)],
    [(2, 5, "D", None, None), (3, 6, "U", "c2", 31), (4, 7, "I", "d", 40)],
]


def test_stream_converges_to_batch_merge(spark, tmp_path):
    src = tmp_path / "log"
    for i, w in enumerate(WAVES):
        _write(spark, src, w, mode="overwrite" if i == 0 else "append")

    view = UpsertView(str(tmp_path / "view"), ["k"], "seq")
    q = view.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    full_log = spark.createDataFrame([r for w in WAVES for r in w], SCHEMA)
    empty = full_log.select("k", "name", "v").limit(0)
    want = _rows(apply_changelog(empty, full_log, ["k"], "seq"))
    assert _rows(view.snapshot(spark)) == want == {
        (1, "a2", 11), (3, "c2", 31), (4, "d", 40)
    }

    # time travel: version 1 (after wave 2) still shows key 2 alive
    assert (1, "a2", 11) in _rows(view.snapshot(spark, version=1))
    assert (2, "b", 20) in _rows(view.snapshot(spark, version=1))

    # replay idempotence: re-running a mid-stream batch rebuilds the
    # identical version from version N-1, no double-apply
    wave2 = spark.createDataFrame(WAVES[1], SCHEMA)
    before = _rows(view.snapshot(spark, version=1))
    view.process_batch(wave2, 1)
    assert _rows(view.snapshot(spark, version=1)) == before

    # vacuum keeps the newest versions only
    dropped = view.vacuum(keep_last=1)
    assert dropped == [0, 1]
    assert _rows(view.snapshot(spark)) == want


def test_partial_write_is_not_a_committed_version(spark, tmp_path):
    import os

    view = UpsertView(str(tmp_path / "view"), ["k"], "seq")
    view.process_batch(spark.createDataFrame(WAVES[0], SCHEMA), 0)
    # simulate a crash mid-write of version 1: directory without _SUCCESS
    partial = os.path.join(str(tmp_path / "view"), "_v=1")
    os.makedirs(partial)
    assert view._versions() == [0]  # partial not serveable
    assert _rows(view.snapshot(spark)) == {(1, "a", 10), (2, "b", 20)}
    # replay overwrites the partial and commits it
    view.process_batch(spark.createDataFrame(WAVES[1], SCHEMA), 1)
    assert view._versions() == [0, 1]
