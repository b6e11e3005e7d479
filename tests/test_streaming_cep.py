"""Streaming CEP == batch CEP on the same data.

The stream arrives in time-ordered waves with a short watermark delay,
so matching happens INCREMENTALLY (partials and rewind suffixes carry
across micro-batches in keyed state). Two trailing per-key sentinel
waves flush: the watermark used by batch N is computed from batch
N−1's data (the propagation lag pinned in
tests/test_watermark_accounting.py), and a group is only invoked in
batches where it has input — so every key gets a far-future row in
each of the last two waves."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pyspark.sql.functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.cep import match_pattern
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.cep import stateful_match_pattern

STEPS = ("signup", "click", "purchase")


def _steps():
    return [F.col("event_type") == t for t in STEPS]


def _match_set(df):
    return {
        (r["key"],) + tuple(r[f"step_{i + 1}_id"] for i in range(len(STEPS)))
        for r in df.collect()
    }


def test_stream_matches_equal_batch(spark, sf_dir, tmp_path):
    ev = (
        register_views(spark, sf_dir, tables=("events",))["events"]
        .select("event_id", "user_id", "ts", "event_type")
        .cache()
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    span = (hi - lo) / 3

    src = tmp_path / "waves"
    for i in range(3):
        wave = ev.filter(
            (F.col("ts") >= lo + i * span)
            & (F.col("ts") < (lo + (i + 1) * span) if i < 2 else F.lit(True))
        )
        wave.coalesce(1).write.mode("append").parquet(str(src))
        import time

        time.sleep(1.2)  # distinct modTimes → deterministic batch order

    users = ev.select("user_id").distinct()
    for j, stamp in enumerate(("2099-01-01 00:00:00", "2099-01-01 01:00:00")):
        sent = users.select(
            (F.lit(10_000_000 + j * 100_000) + F.col("user_id")).alias("event_id"),
            "user_id",
            F.lit(stamp).cast("timestamp_ntz").alias("ts"),
            F.lit("view").alias("event_type"),
        )
        sent.coalesce(1).write.mode("append").parquet(str(src))
        import time

        time.sleep(1.2)

    stream = (
        file_stream(spark, str(src), max_files_per_trigger=1)
        # watermarks require TIMESTAMP (UTC session keeps the wall clock)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 minute")
    )
    out = stateful_match_pattern(
        stream,
        key_col="user_id",
        ts_col="ts",
        steps=_steps(),
        within_seconds=86400,
        id_col="event_id",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cep_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = _match_set(spark.table("cep_stream_out"))

    batch = match_pattern(
        ev, "user_id", "ts", _steps(), within_seconds=86400, id_col="event_id"
    )
    expected = _match_set(batch)
    assert streamed == expected
    assert len(expected) > 0  # non-vacuous: the corpus contains matches


def test_stream_matches_equal_batch_unbounded_horizon(spark, sf_dir, tmp_path):
    """within=None exercises the O(1)-state compaction branch (open
    partials become a synthetic k−1 prefix instead of pinning the
    whole mature suffix)."""
    ev = (
        register_views(spark, sf_dir, tables=("events",))["events"]
        .select("event_id", "user_id", "ts", "event_type")
        .cache()
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    src = tmp_path / "waves"
    import time

    for cond in (F.col("ts") < mid, F.col("ts") >= mid):
        ev.filter(cond).coalesce(1).write.mode("append").parquet(str(src))
        time.sleep(1.2)
    users = ev.select("user_id").distinct()
    for j, stamp in enumerate(("2099-01-01 00:00:00", "2099-01-01 01:00:00")):
        users.select(
            (F.lit(20_000_000 + j * 100_000) + F.col("user_id")).alias("event_id"),
            "user_id",
            F.lit(stamp).cast("timestamp_ntz").alias("ts"),
            F.lit("view").alias("event_type"),
        ).coalesce(1).write.mode("append").parquet(str(src))
        time.sleep(1.2)

    stream = (
        file_stream(spark, str(src), max_files_per_trigger=1)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "1 minute")
    )
    out = stateful_match_pattern(
        stream, key_col="user_id", ts_col="ts", steps=_steps(),
        within_seconds=None, id_col="event_id",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cep_stream_unbounded")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = _match_set(spark.table("cep_stream_unbounded"))
    batch = match_pattern(ev, "user_id", "ts", _steps(), id_col="event_id")
    assert streamed == _match_set(batch)
