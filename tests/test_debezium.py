"""Debezium envelope → changelog → materialized snapshot, end to end."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from flink_application_spark.operators.merge import apply_changelog
from flink_application_spark.sources.debezium import decode_debezium

DDL = "k BIGINT, name STRING, v BIGINT"


def _env(op, ts_ms, before=None, after=None):
    return json.dumps({"op": op, "ts_ms": ts_ms, "before": before, "after": after})


def _lines_df(spark, lines):
    # `line` is the carrier's total order (a Kafka offset in production)
    return spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lines)], "line: long, value: string"
    )


def test_decode_maps_ops_and_images(spark):
    lines = [
        _env("c", 1, after={"k": 1, "name": "a", "v": 10}),
        _env("r", 2, after={"k": 2, "name": "b", "v": 20}),   # snapshot read
        _env("u", 3, before={"k": 1, "name": "a", "v": 10},
             after={"k": 1, "name": "a2", "v": 11}),
        _env("d", 4, before={"k": 2, "name": "b", "v": 20}),
        "{not an envelope",
        _env("x", 5, after={"k": 9, "name": "bad-op", "v": 0}),  # unknown op
    ]
    out = {
        (r["k"], r["seq"], r["op"], r["name"], r["v"])
        for r in decode_debezium(_lines_df(spark, lines), DDL).collect()
    }
    assert out == {
        (1, 1, "I", "a", 10),
        (2, 2, "I", "b", 20),
        (1, 3, "U", "a2", 11),
        (2, 4, "D", "b", 20),  # delete keyed by the before image
    }


def test_envelope_stream_materializes_expected_snapshot(spark):
    lines = [
        _env("c", 1, after={"k": 1, "name": "a", "v": 10}),
        _env("c", 2, after={"k": 2, "name": "b", "v": 20}),
        _env("u", 3, after={"k": 1, "name": "a2", "v": 11}),
        _env("d", 4, before={"k": 2, "name": "b", "v": 20}),
        _env("c", 5, after={"k": 3, "name": "c", "v": 30}),
    ]
    changelog = decode_debezium(_lines_df(spark, lines), DDL)
    empty = changelog.select("k", "name", "v").limit(0)
    snap = {
        (r["k"], r["name"], r["v"])
        for r in apply_changelog(empty, changelog, ["k"], "seq").collect()
    }
    assert snap == {(1, "a2", 11), (3, "c", 30)}


def test_same_ms_tie_resolved_by_offset_seq(spark):
    """One transaction: update then delete in the SAME millisecond.
    With ts_ms as seq the (seq, op) tie-break would pick 'U' and the
    row would wrongly survive; seq_col (the carrier offset) restores
    the total order and the delete wins."""
    lines = [
        _env("c", 1, after={"k": 1, "name": "a", "v": 10}),
        _env("u", 7, after={"k": 1, "name": "a2", "v": 11}),
        _env("d", 7, before={"k": 1, "name": "a2", "v": 11}),
    ]
    changelog = decode_debezium(_lines_df(spark, lines), DDL, seq_col="line")
    empty = changelog.select("k", "name", "v").limit(0)
    assert apply_changelog(empty, changelog, ["k"], "seq").count() == 0


def test_parametrized_types_in_ddl(spark):
    ddl = "k BIGINT, price DECIMAL(10,2), tags ARRAY<STRING>"
    lines = [
        json.dumps(
            {"op": "c", "ts_ms": 1,
             "after": {"k": 1, "price": 9.99, "tags": ["x", "y"]}}
        )
    ]
    r = decode_debezium(_lines_df(spark, lines), ddl).collect()[0]
    assert float(r["price"]) == 9.99 and r["tags"] == ["x", "y"]


def test_schema_wrapped_envelope(spark):
    inner = {"op": "c", "ts_ms": 1, "after": {"k": 5, "name": "w", "v": 50}}
    lines = [json.dumps({"schema": {"type": "struct"}, "payload": inner})]
    # flat decode on wrapped input: every record has NULL op → dropped
    assert decode_debezium(_lines_df(spark, lines), DDL).count() == 0
    out = decode_debezium(
        _lines_df(spark, lines), DDL, payload_wrapped=True
    ).collect()
    assert [(r["k"], r["op"]) for r in out] == [(5, "I")]
