"""CSV-value decoding with the reference's tolerant-ingest semantics.

Reference (AnasDol/flink-application, EnrichmentApp.java:160-181): the
Kafka source declares `'value.csv.null-literal' = ''` (empty field →
NULL, :174) and `'value.csv.ignore-parse-errors' = 'true'` (malformed
line → dropped, :175). This module reproduces both on any DataFrame
carrying a CSV-line `value` column — the shape a Kafka stream, a text
file stream, and the generator's output all share.

Everything stays JVM-side: `F.from_csv` is a Catalyst expression, not
a UDF.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructType

# The CDR wire schema (EnrichmentApp.java:163-170).
CDR_CSV_SCHEMA_DDL = (
    "start_time TIMESTAMP, measuring_probe_name STRING, imsi BIGINT, "
    "msisdn BIGINT, ms_ip_address STRING, unique_cdr_id BIGINT"
)


def decode_csv_value(
    df: DataFrame,
    schema_ddl: str = CDR_CSV_SCHEMA_DDL,
    value_col: str = "value",
    drop_malformed: bool = True,
    null_literal: str = "",
) -> DataFrame:
    """Parse a CSV-line column into typed columns.

    - empty field → NULL (`nullValue`, mirrors value.csv.null-literal '')
    - malformed line → row dropped when `drop_malformed` (mirrors
      value.csv.ignore-parse-errors): PERMISSIVE parse keeps the raw
      line in `_corrupt_record`; we filter rows where it is set.

    Works identically on batch and streaming DataFrames.
    """
    schema = StructType.fromDDL(schema_ddl).add("_corrupt_record", "string")
    options = {
        "nullValue": null_literal,
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": "_corrupt_record",
        "timestampFormat": "yyyy-MM-dd HH:mm:ss[.SSS]",
    }
    value: Column = F.col(value_col).cast("string")
    parsed = df.withColumn("_parsed", F.from_csv(value, schema.simpleString(), options))
    if drop_malformed:
        parsed = parsed.filter(F.col("_parsed._corrupt_record").isNull())
    return parsed.select("_parsed.*").drop("_corrupt_record")


def encode_csv_value(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Record → CSV line (P13/U3; CsvData.java:32-40, Generator.java:49).

    NULLs serialize as empty fields — the exact inverse of
    `decode_csv_value`, so encode∘decode is identity on the wire schema.
    """
    cols = columns or df.columns
    line = F.concat_ws(
        ",", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in cols]
    )
    return df.select(line.alias("value"))
