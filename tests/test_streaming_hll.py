"""Streaming HLL sketch store: estimates equal a direct batch sketch
of the whole stream, and replaying a batch converges (no drift)."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pytest
from pyspark.sql import functions as F

from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.hll import StreamingDistinctSketch


@pytest.fixture()
def typed_stream_dir(spark, tmp_path):
    """Three waves of (event_type, user_id) with cross-wave repeats —
    distinct counting must not double-count users seen in 2 waves.
    Waves are written 1.2 s apart (distinct modTimes → deterministic
    micro-batch order) and the per-wave files tracked, so a replay
    test can re-feed EXACTLY what batch 0 processed."""
    import time

    src = tmp_path / "in"
    wave_files = []
    for part in range(3):
        rows = [
            ("click", i) for i in range(part * 50, part * 50 + 120)
        ] + [("buy", i) for i in range(part * 20, part * 20 + 40)]
        before = set(src.glob("*.parquet")) if src.exists() else set()
        spark.createDataFrame(rows, "event_type string, user_id long").coalesce(
            1
        ).write.mode("append").parquet(str(src))
        wave_files.append(sorted(set(src.glob("*.parquet")) - before)[0])
        time.sleep(1.2)
    return src, wave_files


def test_streaming_sketch_equals_direct_batch_sketch(
    spark, typed_stream_dir, tmp_path
):
    typed_stream_dir, _ = typed_stream_dir
    store = StreamingDistinctSketch(
        str(tmp_path / "state"), group_cols=("event_type",), item_col="user_id"
    )
    q = store.attach(
        file_stream(spark, str(typed_stream_dir), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    got = {
        r["event_type"]: (r["est_distinct"], r["n_rows"])
        for r in store.estimates(spark).collect()
    }
    whole = spark.read.parquet(str(typed_stream_dir))
    direct = {
        r["event_type"]: r["est"]
        for r in whole.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id"))
            .cast("bigint")
            .alias("est")
        )
        .collect()
    }
    exact = {
        r["event_type"]: r["d"]
        for r in whole.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .collect()
    }
    n_rows = {
        r["event_type"]: r["n"]
        for r in whole.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(got) == set(direct)
    for t in got:
        est, n = got[t]
        assert est == direct[t]  # merge == direct sketch
        assert n == n_rows[t]  # row accounting exact
        assert abs(est - exact[t]) <= max(0.05 * exact[t], 2.0)


def test_streaming_sketch_replay_converges(spark, typed_stream_dir, tmp_path):
    """Re-processing a batch id overwrites its own partition — the
    estimates are unchanged (the additive-store replay contract)."""
    typed_stream_dir, wave_files = typed_stream_dir
    store = StreamingDistinctSketch(
        str(tmp_path / "state"), group_cols=("event_type",), item_col="user_id"
    )
    q = store.attach(
        file_stream(spark, str(typed_stream_dir), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    before = sorted(
        (r["event_type"], r["est_distinct"], r["n_rows"])
        for r in store.estimates(spark).collect()
    )
    # replay batch 0 manually with the same content: waves were
    # written 1.2 s apart, so file_stream's modTime order == wave order
    store.process_batch(spark.read.parquet(str(wave_files[0])), 0)
    after = sorted(
        (r["event_type"], r["est_distinct"], r["n_rows"])
        for r in store.estimates(spark).collect()
    )
    assert after == before


def test_empty_state_estimates_dtypes_match_populated(spark, tmp_path):
    """estimates() on a never-written store must return the same dtypes
    the populated path returns when group keys are numeric (round-2
    advice: the empty path hardcoded all-string keys)."""
    from flink_application_spark.streaming.hll import StreamingDistinctSketch

    sk = StreamingDistinctSketch(
        str(tmp_path / "s"),
        group_cols=("user_id",),
        item_col="event_id",
        group_types={"user_id": "bigint"},
    )
    empty = sk.estimates(spark)
    assert dict(empty.dtypes)["user_id"] == "bigint"
    assert empty.count() == 0
    batch = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10)], "user_id bigint, event_id bigint"
    )
    sk.process_batch(batch, 0)
    pop = sk.estimates(spark)
    assert dict(pop.dtypes)["user_id"] == dict(empty.dtypes)["user_id"]
