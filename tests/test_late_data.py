"""Late-data side output: nothing lost, late rows quarantined by a
replay-deterministic watermark (derived from EARLIER batches only)."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import time

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.late_data import LateDataRouter

_DELAY_S = 3600  # 1 hour allowed lateness


def test_late_rows_routed_not_lost(spark, sf_dir, tmp_path):
    ev = register_views(spark, sf_dir, tables=("events",))["events"].select(
        "event_id", "ts", "event_type"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    src = tmp_path / "in"
    # wave 1: the NEWER half (advances the watermark high)
    # wave 2: the OLDER half — heavily late by construction
    for cond in (F.col("ts") >= mid, F.col("ts") < mid):
        ev.filter(cond).coalesce(1).write.mode("append").parquet(str(src))
        time.sleep(1.2)

    router = LateDataRouter(
        str(tmp_path / "out"), ts_col="ts", allowed_delay_seconds=_DELAY_S
    )
    q = router.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    on_time = router.on_time(spark)
    late = router.late(spark)
    # conservation: main ∪ late == input, disjoint
    assert on_time.count() + late.count() == ev.count()
    assert on_time.join(late, "event_id").count() == 0

    # expected split: wave 1 all on-time (no prior watermark); wave 2
    # late iff ts < max(wave1 ts) - delay
    w1_max = ev.filter(F.col("ts") >= mid).agg(F.max("ts")).collect()[0][0]
    cutoff = w1_max.timestamp() - _DELAY_S
    want_late = {
        r["event_id"]
        for r in ev.filter(F.col("ts") < mid).collect()
        if r["ts"].timestamp() < cutoff
    }
    got_late = {r["event_id"] for r in late.collect()}
    assert got_late == want_late
    assert len(want_late) > 0  # non-vacuous


def test_late_routing_replay_deterministic(spark, sf_dir, tmp_path):
    """Replaying batch 1 after batch 2 exists must reproduce batch 1's
    ORIGINAL routing: the applied watermark comes from batches < 1
    only, not from later history."""
    ev = register_views(spark, sf_dir, tables=("events",))["events"].select(
        "event_id", "ts"
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    third = (hi - lo) / 3
    waves = [
        ev.filter((F.col("ts") >= lo + 2 * third)),          # newest first
        ev.filter((F.col("ts") >= lo + third) & (F.col("ts") < lo + 2 * third)),
        ev.filter(F.col("ts") < lo + third),                 # oldest last
    ]
    router = LateDataRouter(
        str(tmp_path / "out"), ts_col="ts", allowed_delay_seconds=60.0
    )
    for i, w in enumerate(waves):
        router.process_batch(w, i)
    before = sorted(r["event_id"] for r in router.late(spark).collect())
    router.process_batch(waves[1], 1)  # replay the middle batch
    after = sorted(r["event_id"] for r in router.late(spark).collect())
    assert after == before


def test_null_event_time_rows_survive(spark, tmp_path):
    """Rows with NULL event time satisfy neither ts < cutoff nor
    ts >= cutoff — before the round-2 advice fix they vanished once a
    watermark existed, breaking main ∪ late == input. They must route
    to on_time (no timestamp ⇒ cannot be late)."""
    router = LateDataRouter(
        str(tmp_path / "out"), ts_col="ts", allowed_delay_seconds=10
    )
    b0 = spark.createDataFrame(
        [(1, "2024-06-01 12:00:00"), (2, None)], "id long, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    b1 = spark.createDataFrame(
        [(3, "2024-06-01 12:00:01"), (4, None), (5, "2024-06-01 00:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    router.process_batch(b0, 0)
    router.process_batch(b1, 1)  # watermark from b0 now applies
    on_ids = {r["id"] for r in router.on_time(spark).collect()}
    late_ids = {r["id"] for r in router.late(spark).collect()}
    assert on_ids | late_ids == {1, 2, 3, 4, 5}
    assert on_ids & late_ids == set()
    assert 4 in on_ids  # NULL ts under an active watermark: kept, on-time
    assert 5 in late_ids  # genuinely late row still quarantined
