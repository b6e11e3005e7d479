"""JSONL (newline-delimited JSON) ingest/egress — the lingua franca of
LLM training corpora (one document object per line).

Mirrors the tolerant-ingest contract of the reference's CSV source
(`sources/csv_decode.py`, cf. EnrichmentApp.java:160-181): malformed
lines are dropped (not failed), missing fields become NULL, and the
decode is a Catalyst expression (`from_json`) — no Python in the path.
Works identically on batch reads, `readStream` file sources, and any
DataFrame carrying a raw `value` line column (Kafka included).

Scale notes: JSON decode is scan-local and codegen'd; pushdown still
applies to post-decode filters on the parsed struct; for long-lived
corpora prefer converting once to parquet (`jsonl_to_parquet`) so
later scans get columnar pruning — JSONL is an interchange format,
not a storage format.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

DOCS_JSONL_SCHEMA_DDL = (
    "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
)


def decode_jsonl_value(
    df: DataFrame,
    schema_ddl: str = DOCS_JSONL_SCHEMA_DDL,
    value_col: str = "value",
    drop_malformed: bool = True,
) -> DataFrame:
    """Parse a JSON-line column into typed columns.

    PERMISSIVE mode surfaces malformed lines as `_corrupt_record`;
    with `drop_malformed` those rows are filtered (the reference's
    ignore-parse-errors semantics), otherwise they pass through with
    all schema fields NULL and the raw line preserved."""
    schema = f"struct<{schema_ddl}, _corrupt_record STRING>"
    parsed = df.withColumn(
        "_p",
        F.from_json(
            F.col(value_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    if drop_malformed:
        # blank/whitespace-only lines parse to a NULL struct (no
        # _corrupt_record set) — require the struct itself non-null or
        # phantom all-NULL documents leak into the corpus
        parsed = parsed.filter(
            F.col("_p").isNotNull() & F.col("_p._corrupt_record").isNull()
        )
        return parsed.select("_p.*").drop("_corrupt_record")
    return parsed.select("_p.*")


def split_jsonl_quarantine(
    df: DataFrame,
    schema_ddl: str = DOCS_JSONL_SCHEMA_DDL,
    value_col: str = "value",
) -> tuple[DataFrame, DataFrame]:
    """(good, quarantine): the dead-letter form of the tolerant decode —
    instead of silently DROPPING malformed lines, they are routed to a
    quarantine frame carrying the raw line plus a reason ('malformed'
    for parse failures, 'blank' for whitespace-only lines), so a feed
    whose producer breaks is debuggable from the sink, not from logs.
    good ∪ quarantine covers every input line exactly once."""
    schema = f"struct<{schema_ddl}, _corrupt_record STRING>"
    parsed = df.withColumn(
        "_p",
        F.from_json(
            F.col(value_col),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ),
    )
    ok = F.col("_p").isNotNull() & F.col("_p._corrupt_record").isNull()
    good = parsed.filter(ok).select("_p.*").drop("_corrupt_record")
    quarantine = parsed.filter(~ok).select(
        F.col(value_col).alias("raw_line"),
        F.when(F.col("_p").isNull(), F.lit("blank"))
        .otherwise(F.lit("malformed"))
        .alias("reason"),
    )
    return good, quarantine


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema_ddl: str = DOCS_JSONL_SCHEMA_DDL,
    drop_malformed: bool = True,
    normalize_text: str | None = None,
) -> DataFrame:
    """Batch-read a JSONL file/directory with tolerant decode.

    ``normalize_text``: optionally Unicode-normalize the `text` column
    at ingest ("NFKC" is the curation default) — the ONE place to do
    it, before any fingerprint/tokenize stage sees mixed composed/
    decomposed forms (functions.text.unicode_normalize)."""
    raw = spark.read.text(path)
    out = decode_jsonl_value(raw, schema_ddl, drop_malformed=drop_malformed)
    if normalize_text is not None and "text" in out.columns:
        from flink_application_spark.functions.text import unicode_normalize

        out = out.withColumn("text", unicode_normalize(F.col("text"), normalize_text))
    return out


def encode_jsonl_value(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Serialize every column into one JSON line per row (the writer
    half of the round-trip; `to_json` is Catalyst, NULLs are omitted
    per JSONL convention)."""
    return df.select(F.to_json(F.struct(*df.columns)).alias(value_col))


def jsonl_to_parquet(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    schema_ddl: str = DOCS_JSONL_SCHEMA_DDL,
) -> int:
    """One-shot interchange→columnar conversion; returns rows written."""
    df = read_jsonl(spark, src_path, schema_ddl)
    df.write.mode("overwrite").parquet(dst_path)
    return spark.read.parquet(dst_path).count()


def jsonl_stream(
    spark: SparkSession,
    path: str,
    schema_ddl: str = DOCS_JSONL_SCHEMA_DDL,
    drop_malformed: bool = True,
) -> DataFrame:
    """Directory-watching JSONL stream with the same tolerant decode —
    the streaming-ingestion entry for corpus drops (each new file is a
    micro-batch; composes with `streaming/ingestion.py`)."""
    raw = spark.readStream.format("text").load(path)
    return decode_jsonl_value(raw, schema_ddl, drop_malformed=drop_malformed)
