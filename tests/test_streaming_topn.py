"""Streaming Top-N (complete mode): the final snapshot equals the
batch top-k over the whole stream, exactly (no sketch — this is the
EXACT rank, unlike the heavy-hitters store)."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.topn import attach_memory, top_talkers


def test_streaming_topn_equals_batch(spark, sf_dir, tmp_path):
    ev = register_views(spark, sf_dir, tables=("events",))["events"].select(
        "user_id", "event_type", "value"
    )
    src = tmp_path / "in"
    for part in range(3):
        ev.filter(F.col("user_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = file_stream(spark, str(src), max_files_per_trigger=1)
    q = attach_memory(
        top_talkers(stream, ("user_id",), k=5), "topn_stream_out"
    )
    q.awaitTermination(300)

    got = [
        (r["user_id"], r["metric"])
        for r in spark.table("topn_stream_out").collect()
    ]
    want = [
        (r["user_id"], r["metric"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("metric"))
        .orderBy(F.col("metric").desc(), F.col("user_id").asc())
        .limit(5)
        .collect()
    ]
    assert got == want
    assert len(got) == 5


def test_streaming_topn_weighted(spark, sf_dir, tmp_path):
    ev = register_views(spark, sf_dir, tables=("events",))["events"].select(
        "event_type", "value"
    )
    src = tmp_path / "in"
    for part in range(2):
        ev.filter(F.crc32(F.col("event_type")) % 2 == part).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = file_stream(spark, str(src), max_files_per_trigger=1)
    q = attach_memory(
        top_talkers(stream, ("event_type",), k=3, weight_col="value"),
        "topn_weighted_out",
    )
    q.awaitTermination(300)
    got = [r["event_type"] for r in spark.table("topn_weighted_out").collect()]
    want = [
        r["event_type"]
        for r in ev.groupBy("event_type")
        .agg(F.sum("value").alias("metric"))
        .orderBy(F.col("metric").desc(), F.col("event_type").asc())
        .limit(3)
        .collect()
    ]
    assert got == want
