"""Debezium CDC envelope decode — the wire format the changelog
machinery consumes in practice (Kafka topics populated by Debezium
connectors carry {op, before, after, ts_ms} JSON envelopes).

One Catalyst `from_json` + a projection maps envelopes onto the
(payload..., seq, op) changelog contract of `operators/merge.py`:

    c / r (create / snapshot read) → I with the `after` image
    u                              → U with the `after` image
    d                              → D keyed by the `before` image

Sequencing: `ts_ms` is only millisecond-resolution — two changes to
one key in the same millisecond (one transaction's update+delete) TIE,
and `latest_changes`' (seq, op) tie-break would then pick the
lexicographically larger op, losing deletes. When the carrier frame
has a total-order column (the Kafka partition offset in the real
consumer, a line/file ordinal in tests), pass it as `seq_col` and it
becomes the resolution sequence outright. Default remains ts_ms with
the hazard documented.

Connector configs with `schemas.enable=true` wrap the envelope as
{schema, payload}; pass `payload_wrapped=True` for that form (the
flat default would otherwise decode every record to a NULL op and
silently drop it).

Malformed envelopes drop under the same PERMISSIVE corrupt-record
contract as the CSV/JSONL sources. Works identically on batch frames
and streams; composed end-to-end in tests/test_debezium.py
(envelope JSONL → decode → changelog → snapshot).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def decode_debezium(
    df: DataFrame,
    payload_ddl: str,
    value_col: str = "value",
    seq_col: str | None = None,
    payload_wrapped: bool = False,
    drop_malformed: bool = True,
) -> DataFrame:
    """Parse a Debezium-envelope JSON line column into changelog rows
    (payload columns..., seq, op). `payload_ddl` describes the table
    row (e.g. "k BIGINT, name STRING, v BIGINT"); any from_json-valid
    DDL works — the row image is expanded structurally, never by
    parsing the DDL text."""
    env = (
        f"struct<op: string, ts_ms: bigint, "
        f"before: struct<{payload_ddl}>, after: struct<{payload_ddl}>, "
        f"_corrupt_record: string>"
    )
    schema = f"struct<payload: {env}>" if payload_wrapped else env
    parsed = df.withColumn(
        "_raw",
        F.from_json(
            F.col(value_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    ).withColumn("_e", F.col("_raw.payload") if payload_wrapped else F.col("_raw"))
    if drop_malformed:
        cond = F.col("_e").isNotNull() & F.col("_e.op").isin("c", "r", "u", "d")
        if not payload_wrapped:
            cond = cond & F.col("_e._corrupt_record").isNull()
        parsed = parsed.filter(cond)
    # the row image: `after` for upserts, `before` for deletes —
    # expanded with a struct select, so parametrized types
    # (DECIMAL(10,2), ARRAY<...>) in the DDL are fine
    img = F.when(F.col("_e.op") == "d", F.col("_e.before")).otherwise(
        F.col("_e.after")
    )
    op = (
        F.when(F.col("_e.op").isin("c", "r"), F.lit("I"))
        .when(F.col("_e.op") == "u", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    seq = F.col(seq_col).cast("bigint") if seq_col else F.col("_e.ts_ms")
    return (
        parsed.select(
            img.alias("_img"), seq.alias("seq"), op.alias("op")
        ).select("_img.*", "seq", "op")
    )
