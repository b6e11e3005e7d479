"""Streaming QUANTIFIED CEP == batch quantified CEP on the same data.

Same wave harness as test_streaming_cep.py (time-ordered waves, short
watermark, two sentinel flush waves); the pattern exercises BOTH
extensions at once: error+ (Kleene plus, greedy) → purchase with a
notFollowedBy 'signup' guard in the gap — partial matches including
open plus-repetitions carry across micro-batches in keyed state.
"""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import time

import pyspark.sql.functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.cep import match_pattern
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.cep import stateful_match_pattern_quant

_QUANTS = ["oneOrMore", "once"]


def _steps():
    return [F.col("event_type") == "error", F.col("event_type") == "purchase"]


def _guards():
    return [F.col("event_type") == "signup"]


def _match_set(df):
    return {
        (
            r["key"],
            r["step_1_id"],
            r["step_1_n"],
            r["step_2_id"],
            r["step_2_n"],
        )
        for r in df.collect()
    }


def test_stream_quant_matches_equal_batch(spark, sf_dir, tmp_path):
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
        time.sleep(1.2)

    users = ev.select("user_id").distinct()
    for j, stamp in enumerate(("2099-01-01 00:00:00", "2099-01-01 01:00:00")):
        users.select(
            (F.lit(10_000_000 + j * 100_000) + F.col("user_id")).alias("event_id"),
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
    out = stateful_match_pattern_quant(
        stream,
        key_col="user_id",
        ts_col="ts",
        steps=_steps(),
        quantifiers=_QUANTS,
        within_seconds=86400,
        id_col="event_id",
        not_between=_guards(),
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cep_quant_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = _match_set(spark.table("cep_quant_stream_out"))

    batch = match_pattern(
        ev,
        "user_id",
        "ts",
        _steps(),
        within_seconds=86400,
        id_col="event_id",
        quantifiers=_QUANTS,
        not_between=_guards(),
    )
    expected = _match_set(batch)
    assert streamed == expected
    assert len(expected) > 0
    # non-vacuous on the quantifier: some burst has length > 1
    assert any(m[2] > 1 for m in expected)


def test_stream_quant_unbounded_no_guards_compaction(spark, sf_dir, tmp_path):
    """within=None and no guards exercises the O(1) bound-compaction
    branch of the quantified operator."""
    ev = (
        register_views(spark, sf_dir, tables=("events",))["events"]
        .select("event_id", "user_id", "ts", "event_type")
        .cache()
    )
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).collect()[0]
    mid = lo + (hi - lo) / 2
    src = tmp_path / "waves"
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
    out = stateful_match_pattern_quant(
        stream,
        key_col="user_id",
        ts_col="ts",
        steps=_steps(),
        quantifiers=_QUANTS,
        within_seconds=None,
        id_col="event_id",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("cep_quant_stream_out2")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    streamed = _match_set(spark.table("cep_quant_stream_out2"))

    batch = match_pattern(
        ev,
        "user_id",
        "ts",
        _steps(),
        within_seconds=None,
        id_col="event_id",
        quantifiers=_QUANTS,
    )
    expected = _match_set(batch)
    assert streamed == expected
    assert len(expected) > 0
