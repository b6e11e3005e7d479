"""Streaming LM gate: streamed verdicts equal batch scoring with the
same persisted model, routing is exhaustive, replay converges."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pytest
from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.plans.lm_queries import score_with_model
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.lm_gate import LMGate, train_lm_to_dir

_LO, _HI = 4.0, 7.5


@pytest.fixture()
def corpus(spark, sf_dir):
    return register_views(spark, sf_dir, tables=("documents",))["documents"]


def test_lm_gate_stream_equals_batch(spark, corpus, tmp_path):
    # train on even docs, stream the odd ones (a genuine train/apply split)
    ref = corpus.filter(F.col("doc_id") % 2 == 0)
    pool = corpus.filter(F.col("doc_id") % 2 == 1).cache()
    model_dir = str(tmp_path / "model")
    train_lm_to_dir(ref, model_dir)

    src = tmp_path / "in"
    for part in range(3):
        pool.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    gate = LMGate(model_dir, str(tmp_path / "out"), lo=_LO, hi=_HI)
    q = gate.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    acc = gate.accepted(spark)
    rej = gate.rejected(spark)
    # routing is exhaustive and disjoint
    assert acc.count() + rej.count() == pool.count()
    assert acc.join(rej, "doc_id").count() == 0

    # streamed verdicts == batch scoring against the same model table
    probs = spark.read.parquet(model_dir)
    batch_scores = score_with_model(pool, probs)
    want_accept = {
        r["doc_id"]
        for r in pool.join(batch_scores, "doc_id", "left")
        .filter(F.col("mean_nll").between(_LO, _HI))
        .collect()
    }
    got_accept = {r["doc_id"] for r in acc.collect()}
    assert got_accept == want_accept

    # every rejection carries a reason
    reasons = {r["verdict"] for r in rej.select("verdict").distinct().collect()}
    assert reasons <= {"too_low", "too_high", "unscorable"}
    pool.unpersist()


def test_lm_gate_replay_converges(spark, corpus, tmp_path):
    ref = corpus.filter(F.col("doc_id") % 2 == 0)
    pool = corpus.filter(F.col("doc_id") % 2 == 1)
    model_dir = str(tmp_path / "model")
    train_lm_to_dir(ref, model_dir)
    gate = LMGate(model_dir, str(tmp_path / "out"), lo=_LO, hi=_HI)

    wave = pool.limit(50)
    gate.process_batch(wave, 0)
    before = sorted(r["doc_id"] for r in gate.accepted(spark).collect())
    gate.process_batch(wave, 0)  # replay
    after = sorted(r["doc_id"] for r in gate.accepted(spark).collect())
    assert after == before
