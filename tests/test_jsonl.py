"""JSONL ingest/egress: tolerant decode, NULL backfill, round-trip."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import json
import os

from flink_application_spark.sources.jsonl import (
    decode_jsonl_value,
    encode_jsonl_value,
    jsonl_to_parquet,
    read_jsonl,
)


def _lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value: string")


def test_decode_drops_malformed_keeps_valid(spark):
    lines = [
        json.dumps({"doc_id": 1, "text": "hello", "lang": "en", "source": "s", "n_chars": 5}),
        "{not json at all",
        json.dumps({"doc_id": 2, "text": "welt", "lang": "de", "source": "s", "n_chars": 4}),
    ]
    out = decode_jsonl_value(_lines_df(spark, lines)).collect()
    assert {r["doc_id"] for r in out} == {1, 2}


def test_missing_fields_null_backfill(spark):
    lines = [json.dumps({"doc_id": 7, "text": "just text"})]
    r = decode_jsonl_value(_lines_df(spark, lines)).collect()[0]
    assert r["doc_id"] == 7 and r["text"] == "just text"
    assert r["lang"] is None and r["n_chars"] is None


def test_keep_malformed_mode_preserves_raw(spark):
    bad = "{broken"
    rows = decode_jsonl_value(
        _lines_df(spark, [bad]), drop_malformed=False
    ).collect()
    assert rows[0]["_corrupt_record"] == bad


def test_roundtrip_and_parquet_conversion(spark, tmp_path):
    docs = spark.createDataFrame(
        [(1, "a b", "en", "s0", 3), (2, "c", "de", "s1", 1)],
        "doc_id: long, text: string, lang: string, source: string, n_chars: long",
    )
    jsonl_path = os.path.join(tmp_path, "docs.jsonl")
    encode_jsonl_value(docs).coalesce(1).write.mode("overwrite").text(jsonl_path)
    back = read_jsonl(spark, jsonl_path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in docs.collect()}

    pq = os.path.join(tmp_path, "docs.parquet")
    n = jsonl_to_parquet(spark, jsonl_path, pq)
    assert n == 2
    assert {r["doc_id"] for r in spark.read.parquet(pq).collect()} == {1, 2}


def test_jsonl_stream_decodes_like_batch(spark, tmp_path):
    import json as _json

    src = os.path.join(tmp_path, "in")
    os.makedirs(src)
    lines = [
        _json.dumps({"doc_id": 1, "text": "x", "lang": "en", "source": "s", "n_chars": 1}),
        "{bad",
        _json.dumps({"doc_id": 2, "text": "y", "lang": "de", "source": "s", "n_chars": 1}),
    ]
    with open(os.path.join(src, "a.jsonl"), "w") as f:
        f.write("\n".join(lines))

    from flink_application_spark.sources.jsonl import jsonl_stream

    q = (
        jsonl_stream(spark, src)
        .writeStream.format("memory")
        .queryName("jsonl_stream_t")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {r["doc_id"] for r in spark.sql("SELECT * FROM jsonl_stream_t").collect()}
    assert got == {1, 2}


def test_jsonl_drop_folder_feeds_ingestion(spark, tmp_path):
    """The product story in streaming form: a JSONL drop folder is the
    corpus source; tolerant decode (malformed lines dropped) feeds the
    crash-safe ingestion pipeline (quality gate → cross-batch dedup →
    shards) unchanged."""
    import json as _json

    from flink_application_spark.sources.jsonl import jsonl_stream
    from flink_application_spark.streaming.ingestion import CorpusIngestion

    src = os.path.join(tmp_path, "drop")
    os.makedirs(src)
    good = "spark filter join window agg batch shuffle partition"
    lines = [
        _json.dumps({"doc_id": 1, "text": good}),
        "{malformed",
        _json.dumps({"doc_id": 2, "text": good + " extra tokens here"}),
    ]
    with open(os.path.join(src, "w1.jsonl"), "w") as f:
        f.write("\n".join(lines))

    ing = CorpusIngestion(
        os.path.join(tmp_path, "work"),
        min_quality=0.0,
        near_dup_threshold=0.9,
        target_file_bytes=64 * 1024,
    )
    q = ing.attach(
        jsonl_stream(spark, src).select("doc_id", "text"),
        checkpoint=os.path.join(tmp_path, "ckpt"),
    )
    q.awaitTermination(300)
    kept = {r.doc_id for r in ing.shards(spark).collect()}
    assert kept == {1, 2}  # malformed line never reached the pipeline


def test_blank_lines_dropped_not_phantom_nulls(spark):
    lines = [
        json.dumps({"doc_id": 1, "text": "a", "lang": "en", "source": "s", "n_chars": 1}),
        "",
        "   ",
        json.dumps({"doc_id": 2, "text": "b", "lang": "de", "source": "s", "n_chars": 1}),
    ]
    out = decode_jsonl_value(_lines_df(spark, lines)).collect()
    assert len(out) == 2 and {r["doc_id"] for r in out} == {1, 2}


def test_quarantine_split_covers_every_line(spark):
    from flink_application_spark.sources.jsonl import (
        decode_jsonl_value,
        split_jsonl_quarantine,
    )

    lines = [
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}',
        "{broken json",
        "   ",
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}',
        "",
    ]
    df = spark.createDataFrame([(x,) for x in lines], "value string")
    good, quarantine = split_jsonl_quarantine(df)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    q = {(r["raw_line"], r["reason"]) for r in quarantine.collect()}
    assert q == {("{broken json", "malformed"), ("   ", "blank"), ("", "blank")}
    # conservation + agreement with the drop-malformed decode
    assert good.count() + quarantine.count() == len(lines)
    assert good.count() == decode_jsonl_value(df).count()


def test_read_jsonl_normalize_text_at_ingest(spark, tmp_path):
    """normalize_text='NFKC' folds decomposed accents and full-width
    forms at the ingest boundary, so identical content gets identical
    dedup fingerprints downstream."""
    import unicodedata

    p = tmp_path / "docs.jsonl"
    composed = "café"                  # é composed
    decomposed = "café"               # e + combining acute
    p.write_text(
        '{"doc_id": 1, "text": "%s"}\n{"doc_id": 2, "text": "%s"}\n'
        % (composed, decomposed),
        encoding="utf-8",
    )
    from flink_application_spark.sources.jsonl import read_jsonl

    df = read_jsonl(
        spark, str(p), schema_ddl="doc_id bigint, text string",
        normalize_text="NFKC",
    )
    texts = {r["doc_id"]: r["text"] for r in df.collect()}
    want = unicodedata.normalize("NFKC", composed)
    assert texts[1] == want and texts[2] == want
