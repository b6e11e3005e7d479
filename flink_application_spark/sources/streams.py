"""Streaming source constructors (SURVEY §2.1 S1/S2/S3/S7).

Each returns a streaming DataFrame; the Kafka/JDBC variants are thin
config builders whose endpoints aren't present in the test container,
so hermetic tests use the file/rate sources through the *same*
downstream operators (Spark's unified API makes the pipeline code
identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flink_application_spark.sources.csv_decode import (
    CDR_CSV_SCHEMA_DDL,
    decode_csv_value,
)


def file_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema_ddl: str | None = None,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """Directory-watching file source — the hermetic stand-in for Kafka.

    Streaming file sources require an explicit schema; pass
    `schema_ddl` or rely on the caller having written a schema-stable
    directory (we infer from a batch peek in that case).
    """
    reader = spark.readStream.format(fmt)
    if schema_ddl is not None:
        reader = reader.schema(schema_ddl)
    else:
        reader = reader.schema(spark.read.format(fmt).options(**options).load(path).schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.options(**options).load(path)


def csv_line_stream(
    spark: SparkSession,
    path: str,
    schema_ddl: str = CDR_CSV_SCHEMA_DDL,
    drop_malformed: bool = True,
) -> DataFrame:
    """Text-file stream of raw CSV lines, decoded with the reference's
    null-literal + ignore-parse-errors semantics (S1 minus the broker).
    """
    raw = spark.readStream.format("text").load(path).withColumnRenamed("value", "value")
    return decode_csv_value(raw, schema_ddl, drop_malformed=drop_malformed)


def rate_stream(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """S7: rate-limited synthetic source (DataGeneratorSource,
    Generator.java:38-47; rowsPerSecond=10 per flink.conf:7).
    Columns: (timestamp TIMESTAMP, value BIGINT)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )


def kafka_csv_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    schema_ddl: str = CDR_CSV_SCHEMA_DDL,
    group_id: str | None = None,
    starting_offsets: str = "latest",
    sasl_jaas: str | None = None,
    drop_malformed: bool = True,
) -> DataFrame:
    """S1: Kafka CSV source (EnrichmentApp.java:160-181; SASL/Kerberos +
    startup-mode options per EnrichmentAppWithoutExplode.java:174-176).

    `startingOffsets="latest"` ≈ `scan.startup.mode = latest-offset`.
    Untestable without a broker — the decode path is shared with
    `csv_line_stream`, which the tests cover.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if group_id is not None:
        reader = reader.option("kafka.group.id", group_id)
    if sasl_jaas is not None:
        reader = (
            reader.option("kafka.security.protocol", "SASL_PLAINTEXT")
            .option("kafka.sasl.mechanism", "GSSAPI")
            .option("kafka.sasl.jaas.config", sasl_jaas)
        )
    return decode_csv_value(reader.load(), schema_ddl, drop_malformed=drop_malformed)


def jdbc_dim(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    user: str | None = None,
    password: str | None = None,
    parquet_fallback: str | None = None,
) -> DataFrame:
    """S2/S3: JDBC dimension scan (EnrichmentApp.java:235-269).

    In stream-static joins Spark re-plans this scan per micro-batch —
    the idiomatic mapping of Flink's TTL'd lookup cache (freshness =
    trigger interval rather than 60 s row-TTL; divergence documented in
    SURVEY §7.3). `parquet_fallback` provides the hermetic test path.
    """
    if parquet_fallback is not None:
        return spark.read.parquet(parquet_fallback)
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    return reader.load()
