"""Debezium CDC envelope decode — the wire format the changelog
machinery consumes in practice (Kafka topics populated by Debezium
connectors carry {op, before, after, ts_ms} JSON envelopes).

One Catalyst `from_json` + a projection maps envelopes onto the
(keys, seq, op, payload) changelog contract of `operators/merge.py`:

    c / r (create / snapshot read) → I with the `after` image
    u                              → U with the `after` image
    d                              → D keyed by the `before` image

`seq` is the envelope's `ts_ms` — Debezium's per-event source clock —
so `latest_changes`' (seq, op) arg-max resolves same-key races the
same way a consumer of the topic would. Malformed envelopes drop under
the same PERMISSIVE corrupt-record contract as the CSV/JSONL sources.

Works identically on batch frames and streams; composed end-to-end in
tests/test_debezium.py: envelope JSONL → decode → UpsertView →
expected snapshot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def decode_debezium(
    df: DataFrame,
    payload_ddl: str,
    key_cols: list[str],
    value_col: str = "value",
    drop_malformed: bool = True,
) -> DataFrame:
    """Parse a Debezium-envelope JSON line column into changelog rows
    (key_cols..., seq, op, payload...). `payload_ddl` describes the
    table row (e.g. "k BIGINT, name STRING, v BIGINT")."""
    schema = (
        f"struct<op: string, ts_ms: bigint, "
        f"before: struct<{payload_ddl}>, after: struct<{payload_ddl}>, "
        f"_corrupt_record: string>"
    )
    parsed = df.withColumn(
        "_e",
        F.from_json(
            F.col(value_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    if drop_malformed:
        parsed = parsed.filter(
            F.col("_e").isNotNull()
            & F.col("_e._corrupt_record").isNull()
            & F.col("_e.op").isin("c", "r", "u", "d")
        )
    # the row image: `after` for upserts, `before` for deletes
    img = F.when(F.col("_e.op") == "d", F.col("_e.before")).otherwise(
        F.col("_e.after")
    )
    op = (
        F.when(F.col("_e.op").isin("c", "r"), F.lit("I"))
        .when(F.col("_e.op") == "u", F.lit("U"))
        .otherwise(F.lit("D"))
    )
    payload_fields = [
        f.split()[0] for f in payload_ddl.split(",")
    ]  # "k BIGINT" → "k"
    return parsed.select(
        *[img.getField(c.strip()).alias(c.strip()) for c in payload_fields],
        F.col("_e.ts_ms").alias("seq"),
        op.alias("op"),
    )
