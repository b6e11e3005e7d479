"""Late-data accounting: the runtime metric that tells an operator how
much data its watermark is discarding — the observability half of the
late-data contract (windowed agg drops late rows silently; the
`numRowsDroppedByWatermark` state-operator metric is how a pipeline
notices).

Watermark propagation detail this pins: the watermark computed from
batch N's max event time takes effect as the LATE-ROW FILTER in batch
N+2 (N+1 is planned against the pre-commit value) — so the late row
arrives two files after the watermark-advancing sentinel."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import time

import pyspark.sql.functions as F

from flink_application_spark.sources.streams import file_stream


def _write(spark, src, rows, mode="append"):
    spark.createDataFrame(rows, "k bigint, ts string, v double").select(
        "k", F.col("ts").cast("timestamp").alias("ts"), "v"
    ).coalesce(1).write.mode(mode).parquet(str(src))
    # distinct modification times: FileStreamSource orders new files by
    # modTime; same-second writes would make batch order nondeterministic
    time.sleep(1.2)


def test_late_rows_dropped_and_counted(spark, tmp_path):
    src = tmp_path / "src"
    # batch 0: a real row + far-future sentinel → watermark jumps ahead
    _write(
        spark,
        src,
        [(1, "2024-01-01 00:00:10", 1.0), (99, "2099-01-01 00:00:00", 0.0)],
        mode="overwrite",
    )
    # batch 1: filler (watermark not yet effective as a filter here)
    _write(spark, src, [(2, "2024-01-01 00:05:00", 2.0)])
    # batch 2: one row far behind the watermark → dropped AND counted
    _write(spark, src, [(3, "2024-01-01 00:00:20", 3.0)])

    agg = (
        file_stream(spark, str(src), max_files_per_trigger=1)
        .withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(F.sum("v").alias("total"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_acct")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    dropped = sum(
        int(op["numRowsDroppedByWatermark"])
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    totals = {
        r["w"]["start"].isoformat(): r["total"]
        for r in spark.table("wm_acct").collect()
    }
    # the late 00:00:20 row is not in its window's total...
    assert totals.get("2024-01-01T00:00:00") == 1.0
    # ...and the drop is accounted, not silent
    assert dropped == 1
