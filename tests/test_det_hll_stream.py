"""DetHllStream contracts: register-wise max makes stream == batch an
exact TABLE identity on any split (idempotent merge — stronger than
the DataSketches twin's estimate-equality); replay is a no-op; crash
partials are invisible; compaction preserves the sketch."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import time

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.hll import det_hll_estimate, det_hll_sketch
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.det_hll import DetHllStream


def _events(spark, sf_dir):
    return register_views(spark, sf_dir, tables=("events",))["events"].select(
        "event_type", "user_id", "event_id"
    )


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def _store(tmp_path):
    return DetHllStream(
        str(tmp_path / "store"), group_cols=("event_type",), item_col="user_id"
    )


def test_stream_equals_batch_table_identity(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    want = _rows(det_hll_sketch(ev, "user_id", ["event_type"]))
    st = _store(tmp_path)
    for i in range(3):
        st.process_batch(ev.filter(F.col("event_id") % 3 == i), i)
    assert _rows(st.sketch(spark)) == want
    assert _rows(st.estimates(spark)) == _rows(
        det_hll_estimate(det_hll_sketch(ev, "user_id", ["event_type"]), ["event_type"])
    )


def test_replay_is_noop(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    st = _store(tmp_path)
    st.process_batch(ev.filter(F.col("event_id") % 2 == 0), 0)
    st.process_batch(ev.filter(F.col("event_id") % 2 == 1), 1)
    want = _rows(st.sketch(spark))
    st.process_batch(ev.filter(F.col("event_id") % 2 == 1), 1)  # replay
    assert _rows(st.sketch(spark)) == want


def test_crash_partial_commit_invisible(spark, sf_dir, tmp_path):
    import pathlib

    ev = _events(spark, sf_dir)
    st = _store(tmp_path)
    st.process_batch(ev.filter(F.col("event_id") < 500), 0)
    want = _rows(st.sketch(spark))
    crash = pathlib.Path(st._dir) / "_batch=1"
    crash.mkdir(parents=True)
    (crash / "part-00000.parquet").write_bytes(b"garbage")
    assert _rows(st.sketch(spark)) == want


def test_attached_stream_matches_batch(spark, sf_dir, tmp_path):
    ev = _events(spark, sf_dir)
    src = tmp_path / "drop"
    for i in range(2):
        if i:
            time.sleep(1.2)
        ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    st = _store(tmp_path)
    q = st.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    want = _rows(det_hll_sketch(ev, "user_id", ["event_type"]))
    assert _rows(st.sketch(spark)) == want


def test_compaction_preserves_sketch(spark, sf_dir, tmp_path):
    from flink_application_spark.streaming.sinks import compact_batches

    ev = _events(spark, sf_dir)
    st = _store(tmp_path)
    for i in range(3):
        st.process_batch(ev.filter(F.col("event_id") % 3 == i), i)
    want = _rows(st.sketch(spark))
    compact_batches(
        spark,
        st._dir,
        min_live_batch=3,
        combine={"rank": "max"},
        group_cols=("event_type", "register"),
    )
    assert _rows(st.sketch(spark)) == want


def test_empty_store_schema(spark, tmp_path):
    st = _store(tmp_path)
    assert st.sketch(spark).columns == ["event_type", "register", "rank"]
    assert st.estimates(spark).count() == 0
