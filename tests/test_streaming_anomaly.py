"""Streaming z-score anomaly detection: scored against PRIOR history,
mergeable moment state, replay-safe commits."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.anomaly import StreamingAnomalyDetector


@pytest.fixture()
def wave_dir(spark, tmp_path):
    """Three waves of N(100, 5) values for key 'a'; wave 0 contains an
    outlier that must NOT be flagged (no prior history), waves 1 and 2
    plant outliers that must be flagged."""
    rng = np.random.default_rng(42)
    src = tmp_path / "in"
    for wave in range(3):
        vals = (100 + 5 * rng.standard_normal(200)).tolist()
        if wave == 0:
            vals.append(500.0)  # unjudgeable: nothing seen before it
        else:
            vals.append(1000.0 + wave)  # planted anomaly
        rows = [("a", float(v)) for v in vals]
        spark.createDataFrame(rows, "sensor string, reading double").coalesce(
            1
        ).write.mode("append").parquet(str(src))
    return src


def test_streaming_anomaly_end_to_end(spark, wave_dir, tmp_path):
    det = StreamingAnomalyDetector(
        str(tmp_path / "state"), key_col="sensor", value_col="reading"
    )
    q = det.attach(
        file_stream(spark, str(wave_dir), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    flagged = sorted(r.value for r in det.flags(spark).collect())
    # the two planted outliers (waves 1, 2); the wave-0 one unjudgeable...
    assert 1001.0 in flagged and 1002.0 in flagged
    assert 500.0 not in flagged
    # ...but it IS history: the merged moments include every event
    hist = det.history(spark).collect()[0]
    assert hist.n == 3 * 201
    # merged-moments mean/std equal a direct global computation
    all_vals = [r.reading for r in spark.read.parquet(str(wave_dir)).collect()]
    assert abs(hist.mean - float(np.mean(all_vals))) < 1e-9
    assert abs(hist.std - float(np.std(all_vals))) < 1e-9


def test_replay_does_not_double_add_or_reflag(spark, wave_dir, tmp_path):
    det = StreamingAnomalyDetector(
        str(tmp_path / "state"), key_col="sensor", value_col="reading"
    )
    waves = spark.read.parquet(str(wave_dir))
    det.process_batch(waves.filter(F.col("reading") < 400), 0)
    det.process_batch(waves.filter(F.col("reading") >= 400), 1)
    n_hist = det.history(spark).collect()[0].n
    n_flags = det.flags(spark).count()
    assert n_flags == 3  # all three extremes judged vs batch-0 history
    det.process_batch(waves.filter(F.col("reading") >= 400), 1)  # replay
    assert det.history(spark).collect()[0].n == n_hist
    assert det.flags(spark).count() == n_flags


def test_no_flags_without_min_history(spark, tmp_path):
    det = StreamingAnomalyDetector(
        str(tmp_path / "state"), key_col="k", value_col="v", min_history=30
    )
    tiny = spark.createDataFrame([("a", 1.0), ("a", 2.0)], "k string, v double")
    det.process_batch(tiny, 0)
    spike = spark.createDataFrame([("a", 9999.0)], "k string, v double")
    det.process_batch(spike, 1)
    assert det.flags(spark).count() == 0  # only 2 prior points: refuse
