"""Streaming drift alarm: a same-distribution wave scores near zero,
a deliberately shifted wave scores clearly higher; replay converges."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import time

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.drift import DriftMonitor, build_baseline


def test_drift_alarm_fires_on_shifted_wave(spark, sf_dir, tmp_path):
    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    baseline_dir = str(tmp_path / "baseline")
    build_baseline(docs, baseline_dir)

    src = tmp_path / "in"
    # wave 0: an unbiased hash-keyed sample — same distribution.
    # (doc_id PARITY would be biased here: the generator assigns
    # source round-robin by doc_id, so parity selects half the
    # sources — the alarm correctly fires on it, which is itself a
    # nice property but not this test's subject.)
    same = docs.filter(F.crc32(F.col("doc_id").cast("string")) % 2 == 0)
    # wave 1: biased hard — only ONE source and truncated lengths
    one_source = docs.select("source").distinct().limit(1).collect()[0]["source"]
    shifted = docs.filter(
        (F.col("source") == one_source) & (F.col("n_chars") < 200)
    )
    assert shifted.count() > 0
    for wave in (same, shifted):
        wave.coalesce(1).write.mode("append").parquet(str(src))
        time.sleep(1.2)

    mon = DriftMonitor(baseline_dir, str(tmp_path / "out"))
    q = mon.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    audit = mon.audit(spark)
    psi = {
        (r["_batch"], r["feature"]): r["psi"] for r in audit.collect()
    }
    # wave 0 stable on every feature; wave 1 alarms on source (the
    # collapsed dimension) and scores higher on every feature
    for feat in ("len_band", "lang", "source"):
        assert psi[(0, feat)] < 0.1, (feat, psi[(0, feat)])
        assert psi[(1, feat)] >= psi[(0, feat)]
    assert psi[(1, "source")] > 0.25

    # replay converges
    first = sorted(src.glob("*.parquet"), key=lambda p: p.stat().st_mtime)[0]
    mon.process_batch(spark.read.parquet(str(first)), 0)
    psi2 = {
        (r["_batch"], r["feature"]): r["psi"] for r in mon.audit(spark).collect()
    }
    assert psi2 == psi
