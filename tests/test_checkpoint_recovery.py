"""Checkpoint/restart recovery (SURVEY §2.6 R1).

The reference enables 180 s checkpointing so a restarted job resumes
without reprocessing (EnrichmentApp.java:48, flink.conf:1). Spark's
equivalent contract: a restarted streaming query with the same
checkpointLocation resumes from committed offsets — files processed
before the stop are not emitted again, files added while down are
picked up, and the output is exactly the union.
"""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import functions as F


def _run_once(spark, src, out, ckpt):
    q = (
        spark.readStream.schema("v bigint")
        .parquet(src)
        .withColumn("doubled", F.col("v") * 2)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_restart_resumes_without_duplicates(spark, tmp_path):
    src, out, ckpt = (str(tmp_path / d) for d in ("src", "out", "ckpt"))

    spark.createDataFrame([(1,), (2,), (3,)], "v bigint").write.parquet(src)
    _run_once(spark, src, out, ckpt)
    first = sorted(r.v for r in spark.read.parquet(out).collect())
    assert first == [1, 2, 3]

    # new data lands while the query is down; restart with same checkpoint
    spark.createDataFrame([(4,), (5,)], "v bigint").write.mode("append").parquet(src)
    _run_once(spark, src, out, ckpt)

    rows = spark.read.parquet(out).collect()
    assert sorted(r.v for r in rows) == [1, 2, 3, 4, 5]  # no dupes, no loss
    assert all(r.doubled == 2 * r.v for r in rows)
