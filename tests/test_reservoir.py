"""Deterministic bottom-k sample: stream must equal the one-pass batch
result under ANY batch split or arrival order (min-k is associative),
and replays must be no-ops."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.reservoir import BottomKSample

_K = 25


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def _docs(spark, sf_dir):
    return register_views(spark, sf_dir, tables=("documents",))["documents"].select(
        "doc_id", "text"
    )


def test_stream_equals_batch_under_any_split(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    want = _ids(BottomKSample(str(tmp_path / "ref"), k=_K).bottom_k(docs))
    assert len(want) == _K

    splits = {
        "ordered-waves": [
            docs.filter(F.col("doc_id") < 170),
            docs.filter(F.col("doc_id") >= 170),
        ],
        "reverse-order": [
            docs.filter(F.col("doc_id") >= 170),
            docs.filter(F.col("doc_id") < 170),
        ],
        "round-robin-4": [docs.filter(F.col("doc_id") % 4 == r) for r in range(4)],
    }
    for name, waves in splits.items():
        rs = BottomKSample(str(tmp_path / f"rs_{name}"), k=_K)
        for bid, wave in enumerate(waves):
            rs.process_batch(wave, bid)
        assert _ids(rs.sample(spark)) == want, name


def test_replay_is_noop(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    rs = BottomKSample(str(tmp_path / "rs"), k=_K)
    rs.process_batch(docs.filter(F.col("doc_id") < 200), 0)
    rs.process_batch(docs.filter(F.col("doc_id") >= 200), 1)
    before = _ids(rs.sample(spark))
    rs.process_batch(docs.filter(F.col("doc_id") >= 200), 1)  # crash replay
    assert _ids(rs.sample(spark)) == before
    assert rs.sample(spark).count() == _K


def test_partial_batch_dir_is_invisible(spark, sf_dir, tmp_path):
    """A crash mid-write leaves _batch=N without _SUCCESS; sample()
    must fall back to the last COMMITTED batch, and the replay must
    rebuild from that same predecessor."""
    import os
    import shutil

    docs = _docs(spark, sf_dir)
    rs = BottomKSample(str(tmp_path / "rs"), k=_K)
    rs.process_batch(docs.filter(F.col("doc_id") < 200), 0)
    committed = _ids(rs.sample(spark))
    rs.process_batch(docs.filter(F.col("doc_id") >= 200), 1)
    # simulate the crash: batch 1's commit marker never landed
    os.remove(str(tmp_path / "rs" / "sample" / "_batch=1" / "_SUCCESS"))
    assert _ids(rs.sample(spark)) == committed  # partial dir invisible
    rs.process_batch(docs.filter(F.col("doc_id") >= 200), 1)  # replay
    want = _ids(BottomKSample(str(tmp_path / "ref"), k=_K).bottom_k(docs))
    assert _ids(rs.sample(spark)) == want
    shutil.rmtree(str(tmp_path / "rs"), ignore_errors=True)


def test_attached_file_stream(spark, sf_dir, tmp_path):
    docs = _docs(spark, sf_dir)
    src = tmp_path / "in"
    for lo, hi in [(0, 250), (250, 1_000_000)]:
        (
            docs.filter((F.col("doc_id") >= lo) & (F.col("doc_id") < hi))
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )
    rs = BottomKSample(str(tmp_path / "rs"), k=_K)
    q = rs.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    want = _ids(BottomKSample(str(tmp_path / "ref"), k=_K).bottom_k(docs))
    assert _ids(rs.sample(spark)) == want


def test_sample_is_unbiased_across_sources(spark, sf_dir):
    # md5 ranks ignore every payload attribute: with k = half the
    # corpus, each of the 20 round-robin sources must contribute
    # SOME docs (a per-source gap at k=250 would need a ~2^-8 tail)
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    rs = BottomKSample("/tmp/unused", k=250)
    got = rs.bottom_k(docs.select("doc_id", "source"))
    n_sources = got.select("source").distinct().count()
    assert n_sources == docs.select("source").distinct().count()
