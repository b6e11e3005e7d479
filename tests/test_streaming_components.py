"""StreamingComponents contracts: after any prefix of the pair
stream, the maintained mapping equals the batch connected-components
answer on the union of all pairs so far; replay is a no-op; crash
windows are invisible; delta recompute leaves untouched components
byte-identical."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import time

from pyspark.sql import functions as F

from flink_application_spark.operators.components import connected_components
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.components import StreamingComponents


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a bigint, id_b bigint")


def _batch_cc(spark, all_rows):
    if not all_rows:
        return []
    cc = connected_components(
        _pairs(spark, all_rows), src="id_a", dst="id_b"
    )
    return sorted((r.v, r.component) for r in cc.collect())


def _stream_map(sc, spark):
    return sorted((r.node, r.component) for r in sc.mapping(spark).collect())


def test_stream_equals_batch_after_every_wave(spark, tmp_path):
    """Waves chosen so components MERGE across batches: {1,2} and
    {3,4} exist after wave 1; wave 2's (2,3) welds them into {1,2,3,4};
    wave 3 attaches a brand-new chain through an old node."""
    sc = StreamingComponents(str(tmp_path / "store"))
    waves = [
        [(1, 2), (3, 4), (10, 11)],
        [(2, 3), (20, 21)],
        [(21, 1), (30, 31), (31, 32)],
    ]
    seen: list = []
    for i, wave in enumerate(waves):
        sc.process_batch(_pairs(spark, wave), i)
        seen += wave
        assert _stream_map(sc, spark) == _batch_cc(spark, seen), f"wave {i}"
    # the welds actually happened: (2,3) joined {1,2}~{3,4} in wave 2,
    # (21,1) joined {20,21} in wave 3; {10,11} stays its own island
    final = dict(_stream_map(sc, spark))
    assert {final[n] for n in (1, 2, 3, 4, 20, 21)} == {1}
    assert {final[n] for n in (10, 11)} == {10}
    assert {final[n] for n in (30, 31, 32)} == {30}


def test_replay_is_noop(spark, tmp_path):
    sc = StreamingComponents(str(tmp_path / "store"))
    w1, w2 = [(1, 2), (3, 4)], [(2, 3)]
    sc.process_batch(_pairs(spark, w1), 0)
    sc.process_batch(_pairs(spark, w2), 1)
    want = _stream_map(sc, spark)
    sc.process_batch(_pairs(spark, w2), 1)  # crash-replay of batch 1
    assert _stream_map(sc, spark) == want == _batch_cc(spark, w1 + w2)


def test_untouched_components_carry_forward(spark, tmp_path):
    """A batch touching only component {1,2} must not rewrite the
    verdicts of the untouched {50,51} component (delta recompute)."""
    sc = StreamingComponents(str(tmp_path / "store"))
    sc.process_batch(_pairs(spark, [(1, 2), (50, 51)]), 0)
    sc.process_batch(_pairs(spark, [(2, 3)]), 1)
    final = dict(_stream_map(sc, spark))
    assert final[50] == 50 and final[51] == 50
    assert final[1] == final[2] == final[3] == 1


def test_empty_batch_carries_mapping_forward(spark, tmp_path):
    sc = StreamingComponents(str(tmp_path / "store"))
    sc.process_batch(_pairs(spark, [(1, 2)]), 0)
    sc.process_batch(_pairs(spark, []), 1)
    assert _stream_map(sc, spark) == [(1, 1), (2, 1)]


def test_attached_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "pairs"
    waves = [[(1, 2), (3, 4)], [(2, 3)], [(5, 6)]]
    _pairs(spark, waves[0]).write.mode("append").parquet(str(src))
    for w in waves[1:]:
        time.sleep(1.2)  # modTime separates micro-batch order
        _pairs(spark, w).write.mode("append").parquet(str(src))
    sc = StreamingComponents(str(tmp_path / "store"))
    q = sc.attach(
        file_stream(spark, str(src), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)
    assert _stream_map(sc, spark) == _batch_cc(
        spark, [p for w in waves for p in w]
    )


def test_uncommitted_snapshot_is_invisible(spark, tmp_path):
    import os
    import pathlib

    sc = StreamingComponents(str(tmp_path / "store"))
    sc.process_batch(_pairs(spark, [(1, 2)]), 0)
    want = _stream_map(sc, spark)
    # simulate a crash mid-write of snapshot 1: files but no _SUCCESS
    crash = pathlib.Path(sc._map_dir) / "_batch=1"
    crash.mkdir(parents=True)
    (crash / "part-00000.parquet").write_bytes(b"garbage")
    assert _stream_map(sc, spark) == want
    # and the replayed batch overwrites the garbage cleanly
    sc.process_batch(_pairs(spark, [(2, 3)]), 1)
    assert os.path.exists(crash / "_SUCCESS")
    assert _stream_map(sc, spark) == _batch_cc(spark, [(1, 2), (2, 3)])


def test_composed_streaming_canonical_dedup(spark, sf_dir, tmp_path):
    """End-to-end streaming corpus dedup: the incremental near-dup
    index emits pairs per batch, StreamingComponents folds them into
    cross-batch duplicate groups, and canonical = min doc_id per
    group — after the last wave this must equal the whole batch
    pipeline (LSH pairs → connected components → min-id canonical) on
    the full corpus."""
    from flink_application_spark.catalog import register_views
    from flink_application_spark.operators.minhash import verified_near_dup_pairs
    from flink_application_spark.streaming.dedup_index import NearDupIndex

    docs = register_views(spark, sf_dir, tables=("documents",))[
        "documents"
    ].select("doc_id", "text")
    waves = [
        docs.filter(F.col("doc_id") % 3 == i) for i in range(3)
    ]
    idx = NearDupIndex(str(tmp_path / "index"), threshold=0.5)
    sc = StreamingComponents(str(tmp_path / "components"))
    for i, wave in enumerate(waves):
        idx.process_batch(wave, i)
        sc.process_batch(idx.batch_pairs(spark, i), i)

    stream_canonical = dict(_stream_map(sc, spark))

    batch_pairs = verified_near_dup_pairs(docs, threshold=0.5)
    batch_cc = connected_components(batch_pairs, src="id_a", dst="id_b")
    batch_canonical = {r.v: r.component for r in batch_cc.collect()}
    assert stream_canonical == batch_canonical
    assert stream_canonical  # the corpus actually has near-dup groups


def test_vacuum_snapshots_keeps_answers_identical(spark, tmp_path):
    """Snapshot vacuum drops superseded mapping generations (and
    crash-partial garbage) without changing any answer a live or
    replayed batch would read."""
    import pathlib

    from flink_application_spark.streaming.sinks import vacuum_snapshots

    sc = StreamingComponents(str(tmp_path / "store"))
    sc.process_batch(_pairs(spark, [(1, 2)]), 0)
    sc.process_batch(_pairs(spark, [(2, 3)]), 1)
    sc.process_batch(_pairs(spark, [(4, 5)]), 2)
    # crash-partial dir below the horizon: vacuumable garbage
    crash = pathlib.Path(sc._map_dir) / "_batch=1.5"  # non-int: ignored
    want = _stream_map(sc, spark)
    removed = vacuum_snapshots(sc._map_dir, min_live_batch=2, keep_last=1)
    assert removed == 1  # snapshot 0 dropped; snapshot 1 kept (latest < 2)
    assert _stream_map(sc, spark) == want
    # a replay of live batch 2 still reads snapshot 1 and is a no-op
    sc.process_batch(_pairs(spark, [(4, 5)]), 2)
    assert _stream_map(sc, spark) == want
