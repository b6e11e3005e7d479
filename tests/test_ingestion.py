"""Composed streaming corpus ingestion: quality gate → cross-batch
keep-first near-dup drop → size-capped shards → audit trail."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import pytest
from pyspark.sql import functions as F

from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.ingestion import CorpusIngestion

def _good(tag: str) -> str:
    """Quality-passing text whose 3-gram shingles are unique per tag
    (every trigram contains a tag-derived token), so distinct tags are
    NOT near-dups of each other at any threshold; only exact copies
    collide."""
    words = []
    for i in range(12):
        words += ["the", f"{tag}{i}", "and"]
    return " ".join(words) + " is that a in of to"


_JUNK = "!!! ??? ***"  # low quality: short, no stopwords, pure punctuation


@pytest.fixture()
def waves(spark, tmp_path):
    """Three arrival waves with planted cross-wave and in-wave dups."""
    src = tmp_path / "in"
    w1 = [(1, _good("one")), (2, _good("two")), (90, _JUNK)]
    # 11 dups wave-1's doc 1 (cross-batch); 3&4 duplicate each other (in-batch)
    w2 = [
        (11, _good("one")),
        (3, _good("three")),
        (4, _good("three")),
    ]
    # 12 dups doc 2; 5 is fresh; junk again
    w3 = [(12, _good("two")), (5, _good("five")), (91, _JUNK)]
    for wave in (w1, w2, w3):
        spark.createDataFrame(wave, "doc_id bigint, text string").coalesce(
            1
        ).write.mode("append").parquet(str(src))
    return src


def test_ingestion_end_to_end(spark, waves, tmp_path):
    ing = CorpusIngestion(
        str(tmp_path / "work"),
        min_quality=0.3,
        near_dup_threshold=0.5,
        target_file_bytes=64 * 1024,
    )
    q = ing.attach(
        file_stream(spark, str(waves), max_files_per_trigger=1),
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(300)

    kept = {r.doc_id for r in ing.shards(spark).collect()}
    # junk dropped by quality; 11,12 dropped as cross-batch dups;
    # 4 dropped as in-batch dup of 3 (keep min id)
    assert kept == {1, 2, 3, 5}

    audit = {r.batch_id: r for r in ing.audit(spark).collect()}
    assert audit[0].n_in == 3 and audit[0].n_quality_rejected == 1
    assert audit[0].n_dup_rejected == 0 and audit[0].n_out == 2
    assert audit[1].n_dup_rejected == 2 and audit[1].n_out == 1
    assert audit[2].n_quality_rejected == 1 and audit[2].n_dup_rejected == 1
    assert audit[2].n_out == 1
    # token counts materialized on the training shards
    assert ing.shards(spark).filter(F.col("n_tok") <= 0).count() == 0


def test_ingestion_replay_idempotent(spark, waves, tmp_path):
    """Replay of a PAIR-PRODUCING batch (in-batch dup 3/4 plus the
    cross-batch dup 11 of 1): shard rows, audit rows, and the pair log
    must all be row-identical after the replay."""
    ing = CorpusIngestion(str(tmp_path / "work"), target_file_bytes=64 * 1024)
    b0 = spark.read.parquet(str(waves)).filter(F.col("doc_id").isin(1, 2))
    ing.process_batch(b0, 0)
    b1 = spark.read.parquet(str(waves)).filter(F.col("doc_id").isin(11, 3, 4))
    ing.process_batch(b1, 1)
    shards_before = sorted(r.doc_id for r in ing.shards(spark).collect())
    pairs_before = ing.index.pairs(spark).count()
    assert pairs_before > 0  # replay below actually exercises the pair path
    ing.process_batch(b1, 1)  # crash-replay
    assert sorted(r.doc_id for r in ing.shards(spark).collect()) == shards_before
    assert ing.index.pairs(spark).count() == pairs_before
    assert ing.audit(spark).filter(F.col("batch_id") == 1).count() == 1
