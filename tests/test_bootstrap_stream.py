"""BootstrapCIStream contracts: additive partials make stream ==
batch an INTEGER IDENTITY on any batch split; replay is a no-op;
crash-partial commits are invisible."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import time

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.plans.registry import REGISTRY_GET
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.bootstrap_ci import BootstrapCIStream


def _docs(spark, sf_dir):
    return register_views(spark, sf_dir, tables=("documents",))[
        "documents"
    ].select("doc_id", "source", "text")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_equals_batch_on_any_split(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    want = _rows(REGISTRY_GET("source_quality_bootstrap_ci").spark(spark, sf_dir))
    bs = BootstrapCIStream(str(tmp_path / "store"))
    for i in range(3):
        bs.process_batch(docs.filter(F.col("doc_id") % 3 == i), i)
    assert _rows(bs.report(spark)) == want


def test_replay_is_noop(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    bs = BootstrapCIStream(str(tmp_path / "store"))
    bs.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    bs.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    want = _rows(bs.report(spark))
    bs.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)  # replay
    assert _rows(bs.report(spark)) == want


def test_crash_partial_commit_invisible(spark, sf_dir, tmp_path):
    import pathlib

    docs = _docs(spark, sf_dir)
    bs = BootstrapCIStream(str(tmp_path / "store"))
    bs.process_batch(docs.filter(F.col("doc_id") < 100), 0)
    want = _rows(bs.report(spark))
    crash = pathlib.Path(bs._partials_dir) / "_batch=1"
    crash.mkdir(parents=True)
    (crash / "part-00000.parquet").write_bytes(b"garbage")
    assert _rows(bs.report(spark)) == want


def test_attached_stream_matches_batch(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    src = tmp_path / "drop"
    for i in range(2):
        if i:
            time.sleep(1.2)
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    bs = BootstrapCIStream(str(tmp_path / "store"))
    q = bs.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    want = _rows(REGISTRY_GET("source_quality_bootstrap_ci").spark(spark, sf_dir))
    assert _rows(bs.report(spark)) == want


def test_compaction_preserves_report(spark, sf_dir, tmp_path):
    from flink_application_spark.streaming.sinks import compact_batches

    docs = _docs(spark, sf_dir)
    bs = BootstrapCIStream(str(tmp_path / "store"))
    for i in range(3):
        bs.process_batch(docs.filter(F.col("doc_id") % 3 == i), i)
    want = _rows(bs.report(spark))
    absorbed = compact_batches(
        spark,
        bs._partials_dir,
        min_live_batch=3,
        combine={"swq": "sum", "sw": "sum"},
        group_cols=("source", "b"),
    )
    assert absorbed == 3
    assert _rows(bs.report(spark)) == want
