"""Byte-size rolling policy (flink.conf:54-55, 110 MB file-size cap):
the size-calibrated foreachBatch sink must keep every produced parquet
file under the target byte size while converging toward full files."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import glob
import os

import pytest
from pyspark.sql import functions as F

from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.sinks import (
    SizeCalibratedRoller,
    write_partitioned_parquet_size_rolled,
)

_TARGET = 64 * 1024  # 64 KiB stand-in for the 110 MB production cap


@pytest.fixture()
def wide_rows_dir(spark, tmp_path):
    """Four input files -> four micro-batches (maxFilesPerTrigger=1);
    rows carry ~1 KiB of md5-noise so parquet can't compress them away
    and bytes-per-row is meaningfully measurable."""
    src = tmp_path / "in"
    payload = F.concat(*[F.md5(F.concat(F.col("id"), F.lit(i))) for i in range(32)])
    for part in range(4):
        (
            spark.range(part * 500, (part + 1) * 500)
            .select(F.col("id"), payload.alias("payload"))
            .coalesce(1)
            .write.mode("append")
            .parquet(str(src))
        )
    return src


def _data_files(path):
    return glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)


def test_size_rolled_sink_respects_byte_ceiling(spark, wide_rows_dir, tmp_path):
    out = str(tmp_path / "sink")
    stream = file_stream(spark, str(wide_rows_dir), max_files_per_trigger=1)
    q = write_partitioned_parquet_size_rolled(
        stream,
        out,
        checkpoint=str(tmp_path / "ckpt"),
        partition_by=(),
        target_file_bytes=_TARGET,
        initial_records_per_file=50,
        trigger=None,
    )
    q.awaitTermination(300)

    files = _data_files(out)
    assert len(files) > 1
    sizes = [os.path.getsize(f) for f in files]
    # ceiling: small parquet files carry fixed footer overhead, hence
    # the 1.25 allowance; at the production 110 MB target the footer is
    # noise and the headroom factor (0.9) absorbs row-width variance
    assert max(sizes) <= _TARGET * 1.25, sizes
    # calibration must converge upward: the biggest file should be a
    # real fraction of the target, not the initial 50-row guess forever
    assert max(sizes) >= _TARGET * 0.4, sizes
    # no rows lost across batches
    assert spark.read.parquet(out).count() == 2000


def test_size_rolled_sink_batch_replay_is_noop(spark, tmp_path):
    out = str(tmp_path / "sink")
    roller = SizeCalibratedRoller(out, (), _TARGET, 100)
    batch = spark.range(100).select(F.col("id"), F.md5(F.col("id").cast("string")).alias("h"))
    roller(batch, 7)
    n1 = spark.read.parquet(out).count()
    roller(batch, 7)  # checkpoint replay overwrites its own _batch dir
    assert spark.read.parquet(out).count() == n1 == 100


def test_first_batch_ceiling_holds_for_wide_rows(spark, tmp_path):
    """With no initial record cap given, the first batch must
    sample-calibrate: even rows ~8 KiB wide cannot produce a file over
    the target (the old fixed-10k-records default would have written
    one giant file)."""
    out = str(tmp_path / "sink")
    roller = SizeCalibratedRoller(out, (), _TARGET)  # no initial cap
    payload = F.concat(*[F.md5(F.concat(F.col("id"), F.lit(i))) for i in range(256)])
    wide = spark.range(200).select(F.col("id"), payload.alias("payload"))
    roller(wide, 0)
    sizes = [os.path.getsize(f) for f in _data_files(out)]
    assert sizes and max(sizes) <= _TARGET * 1.25, sizes


def test_compact_batches_event_sink_mode(spark, tmp_path):
    """Round-8 small-file control: compact_batches(partition_by=...)
    folds every committed _batch dir of a size-rolled EVENT sink into
    one consolidated negative-id batch that (a) keeps the user
    partition directories (pruning survives), (b) preserves the exact
    row multiset, and (c) collapses the file count — including the
    single-batch case, where the fan-out is within the batch."""
    from flink_application_spark.streaming.sinks import (
        compact_batches,
        committed_batch_dirs,
        idempotent_batch_write,
    )

    root = str(tmp_path / "sink")
    rows = spark.range(0, 3000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("event_date"),
        (F.col("id") % 5).cast("string").alias("probe"),
    )
    # 4 committed batches × 8 writer tasks × 15 partition combos
    for b in range(4):
        idempotent_batch_write(
            rows.filter(F.col("id") % 4 == b).repartition(8),
            root,
            b,
            partition_by=("event_date", "probe"),
        )
    pre_files = glob.glob(f"{root}/**/*.parquet", recursive=True)
    pre_rows = sorted(r["id"] for r in spark.read.parquet(root).collect())
    max_bid = max(
        int(os.path.basename(p).split("=", 1)[1]) for p in committed_batch_dirs(root)
    )
    absorbed = compact_batches(
        spark, root, min_live_batch=max_bid + 1, partition_by=("event_date", "probe")
    )
    assert absorbed == 4
    post_files = glob.glob(f"{root}/**/*.parquet", recursive=True)
    assert len(post_files) <= 15  # one writer → ≤1 file per (date×probe)
    assert len(post_files) * 4 <= len(pre_files)  # per-batch fan-out folded
    post = spark.read.parquet(root)
    assert sorted(r["id"] for r in post.collect()) == pre_rows
    # user partition columns survive as partition dirs (pruning works)
    assert {os.path.basename(os.path.dirname(os.path.dirname(p)))
            for p in post_files} <= {f"event_date={i}" for i in range(3)}
    pruned = post.filter("event_date = '1' AND probe = '2'")
    assert pruned.count() == 200

    # coarsen-on-compact (the bench's shape): re-compact the already-
    # consolidated store down to the date axis alone — probe becomes a
    # plain column, the file count collapses to ~#dates, rows invariant
    absorbed2 = compact_batches(
        spark, root, min_live_batch=max_bid + 1, partition_by=("event_date",)
    )
    assert absorbed2 == 1  # re-absorbs the prior consolidated batch
    post2_files = glob.glob(f"{root}/**/*.parquet", recursive=True)
    assert len(post2_files) <= 3  # one file per date
    assert len(post2_files) * 10 <= len(pre_files)  # ≥10× vs the raw sink
    post2 = spark.read.parquet(root)
    assert sorted(r["id"] for r in post2.collect()) == pre_rows
    assert post2.filter("event_date = '1' AND probe = '2'").count() == 200

    # single-batch fold: a fresh sink with ONE committed batch still
    # compacts in event-sink mode (refused in additive-store mode)
    root2 = str(tmp_path / "sink2")
    idempotent_batch_write(
        rows.repartition(8), root2, 0, partition_by=("event_date", "probe")
    )
    assert compact_batches(spark, root2, min_live_batch=1) == 0  # store mode: <2
    assert (
        compact_batches(
            spark, root2, min_live_batch=1, partition_by=("event_date", "probe")
        )
        == 1
    )
    assert spark.read.parquet(root2).count() == 3000


def test_compact_batches_skips_uncommitted_partials(spark, tmp_path):
    """A crash-partial _batch dir below the horizon (no _SUCCESS) must
    NOT be folded — folding would make partial data permanent; its
    replay still finds the directory to overwrite (round-8 ADVICE)."""
    import pytest

    from flink_application_spark.streaming.sinks import (
        compact_batches,
        idempotent_batch_write,
    )

    root = str(tmp_path / "sink")
    rows = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("event_date")
    )
    for b in range(3):
        idempotent_batch_write(rows.filter(F.col("id") % 3 == b), root, b)
    os.remove(os.path.join(root, "_batch=1", "_SUCCESS"))  # crash partial
    assert compact_batches(spark, root, min_live_batch=3) == 2  # 0 and 2 only
    assert os.path.isdir(os.path.join(root, "_batch=1"))  # awaits its replay
    folded = spark.read.parquet(os.path.join(root, "_batch=-4"))
    assert folded.count() == 200  # batch 1's rows excluded

    # coarsen guard: with a LIVE batch remaining, a partition_by that
    # differs from the sink layout would leave mixed partition depths
    # under one root — refused; the full layout is still allowed
    root2 = str(tmp_path / "sink2")
    rows2 = rows.withColumn("probe", (F.col("id") % 5).cast("string"))
    for b in range(2):
        idempotent_batch_write(
            rows2.filter(F.col("id") % 2 == b),
            root2,
            b,
            partition_by=("event_date", "probe"),
        )
    with pytest.raises(ValueError, match="differs"):
        compact_batches(
            spark, root2, min_live_batch=1, partition_by=("event_date",)
        )
    assert (
        compact_batches(
            spark, root2, min_live_batch=1, partition_by=("event_date", "probe")
        )
        == 1
    )
    assert spark.read.parquet(root2).count() == 300


def test_compact_rerun_unchanged_horizon_is_noop(spark, tmp_path):
    """Round-9 ADVICE: re-running compact_batches at an unchanged
    horizon with nothing new below it and the SAME layout must be a
    no-op (return 0, bytes untouched) — not a phantom absorb that
    rewrites the store and briefly hides consolidated rows. New data
    at the same horizon still folds, via the rename-aside swap."""
    from flink_application_spark.streaming.sinks import (
        compact_batches,
        idempotent_batch_write,
    )

    root = str(tmp_path / "sink")
    rows = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("event_date")
    )
    for b in range(2):
        idempotent_batch_write(
            rows.filter(F.col("id") % 2 == b),
            root,
            b,
            partition_by=("event_date",),
        )
    assert (
        compact_batches(spark, root, min_live_batch=2, partition_by=("event_date",))
        == 2
    )
    files_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{root}/**/*.parquet", recursive=True)
    }
    # same horizon, same layout, nothing new → no-op
    assert (
        compact_batches(spark, root, min_live_batch=2, partition_by=("event_date",))
        == 0
    )
    files_after = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{root}/**/*.parquet", recursive=True)
    }
    assert files_after == files_before  # bytes untouched, not rewritten
    # a NEW committed batch below the same horizon still folds and
    # re-absorbs the prior consolidated dir (2 absorbed: it + batch 1')
    extra = spark.range(300, 400).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("event_date")
    )
    idempotent_batch_write(extra, root, 1, partition_by=("event_date",))
    assert (
        compact_batches(spark, root, min_live_batch=2, partition_by=("event_date",))
        == 2
    )
    assert spark.read.parquet(root).count() == 400
    assert not os.path.exists(os.path.join(root, ".compact_old"))  # swap debris gone


def test_compact_crash_between_swap_renames_recovers(spark, tmp_path):
    """Round-10 ADVICE: if a crash lands between rename(consolidated →
    .compact_old) and rename(tmp → consolidated), the aside dir holds
    the ONLY copy of previously consolidated rows. The next compaction
    must fold those rows back in — not rmtree them as debris. The
    post-swap crash (consolidated present AND aside present) must
    still treat the aside as debris, without double-counting."""
    import shutil

    from flink_application_spark.streaming.sinks import (
        compact_batches,
        idempotent_batch_write,
    )

    root = str(tmp_path / "sink")
    rows = spark.range(0, 300).select(
        F.col("id"), (F.col("id") % 3).cast("string").alias("event_date")
    )
    for b in range(2):
        idempotent_batch_write(
            rows.filter(F.col("id") % 2 == b), root, b,
            partition_by=("event_date",),
        )
    compact_batches(spark, root, min_live_batch=2, partition_by=("event_date",))
    consolidated = os.path.join(root, "_batch=-3")
    assert os.path.isdir(consolidated)
    # --- crash BETWEEN the two renames: consolidated gone, aside only copy
    os.rename(consolidated, os.path.join(root, ".compact_old"))
    idempotent_batch_write(
        spark.range(300, 400).select(
            F.col("id"), (F.col("id") % 3).cast("string").alias("event_date")
        ),
        root, 2, partition_by=("event_date",),
    )
    compact_batches(spark, root, min_live_batch=3, partition_by=("event_date",))
    assert spark.read.parquet(root).count() == 400  # nothing lost
    assert not os.path.exists(os.path.join(root, ".compact_old"))
    # --- crash AFTER the swap (before the aside rmtree): aside is a
    # duplicate of rows already inside the new consolidated — debris
    new_consolidated = glob.glob(os.path.join(root, "_batch=-*"))[0]
    shutil.copytree(new_consolidated, os.path.join(root, ".compact_old"))
    idempotent_batch_write(
        spark.range(400, 450).select(
            F.col("id"), (F.col("id") % 3).cast("string").alias("event_date")
        ),
        root, 3, partition_by=("event_date",),
    )
    compact_batches(spark, root, min_live_batch=4, partition_by=("event_date",))
    assert spark.read.parquet(root).count() == 450  # no double-count
    assert not os.path.exists(os.path.join(root, ".compact_old"))
