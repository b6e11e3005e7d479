"""Streaming sinks + runner policies (SURVEY §2.1 S4/S5/S6/S8, §2.6 R1/R4).

Reference sink surface: labeled console print (EnrichmentApp.java:
97-103), partitioned parquet on HDFS with a rolling policy
(EnrichmentApp.java:183-204: PARTITIONED BY (event_date, probe),
file-size 110 MB / check 5 s / rollover 20 s; flink.conf:51-59), two
INSERTs into one sink table (EnrichmentAppWithoutExplode.java:103-104),
checkpointing every 180 s (EnrichmentApp.java:48).

Spark mapping: the micro-batch trigger plays the rollover-interval
role (one file per partition per batch); `maxRecordsPerFile`
approximates the size cap; `checkpointLocation` is per-query exactly
like Flink's per-job checkpoint path. Two-queries-one-path fights over
the committer, so multi-sink fan-in is union-before-write (R4).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def _trigger_kwargs(trigger: str | None) -> dict:
    if trigger is None or trigger == "availableNow":
        return {"availableNow": True}
    return {"processingTime": trigger}


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = ("event_date", "probe"),
    trigger: str | None = "20 seconds",
    max_records_per_file: int | None = None,
    query_name: str = "parquet_sink",
) -> StreamingQuery:
    """S4: partitioned parquet sink with trigger + checkpoint."""
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .partitionBy(*partition_by)
        .queryName(query_name)
        .trigger(**_trigger_kwargs(trigger))
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    return writer.start()


class _SizeCalibratedRoller:
    """foreachBatch writer that approximates a byte-size rolling policy
    (flink.conf:54-55: sink.rolling-policy.file-size = 110 MB).

    Spark's parquet writer rolls on RECORD count (`maxRecordsPerFile`),
    not bytes, so the cap is enforced by calibration: after every batch
    the writer reads the parquet footers it has produced (pyarrow
    metadata — footer-only, no data read), derives observed
    bytes-per-row, and re-sizes `maxRecordsPerFile` for the next batch
    to `target_file_bytes`. The initial batch uses a deliberately small
    record cap so the ceiling holds before any calibration exists; the
    estimate then converges upward toward full-size files.

    Restart semantics: a batch-id marker directory makes re-delivered
    micro-batches (checkpoint replay after failure) no-ops, matching
    the idempotent-commit behavior of the reference's rolling sink."""

    def __init__(
        self,
        path: str,
        partition_by: tuple[str, ...],
        target_file_bytes: int,
        initial_records_per_file: int,
        headroom: float = 0.9,
    ) -> None:
        self.path = path
        self.partition_by = partition_by
        self.target = target_file_bytes
        self.max_records = initial_records_per_file
        self.headroom = headroom

    def _recalibrate(self) -> None:
        import os

        import pyarrow.parquet as pq

        total_bytes = 0
        total_rows = 0
        for root, _dirs, files in os.walk(self.path):
            if "_batch_markers" in root:
                continue
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(root, f)
                total_bytes += os.path.getsize(full)
                total_rows += pq.ParquetFile(full).metadata.num_rows
        if total_rows:
            bytes_per_row = max(total_bytes / total_rows, 1e-9)
            self.max_records = max(1, int(self.target * self.headroom / bytes_per_row))

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        import os

        marker_dir = os.path.join(self.path, "_batch_markers")
        os.makedirs(marker_dir, exist_ok=True)
        marker = os.path.join(marker_dir, str(batch_id))
        if os.path.exists(marker):  # checkpoint replay → already written
            return
        writer = batch_df.write.option("maxRecordsPerFile", self.max_records)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        writer.mode("append").parquet(self.path)
        with open(marker, "w") as f:
            f.write("done")
        self._recalibrate()


def write_partitioned_parquet_size_rolled(
    df: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: tuple[str, ...] = ("event_date", "probe"),
    target_file_bytes: int = 110 * 1024 * 1024,
    initial_records_per_file: int = 10_000,
    trigger: str | None = None,
    query_name: str = "parquet_sink_size_rolled",
) -> StreamingQuery:
    """S4 with the byte-size rolling policy: every produced file stays
    under `target_file_bytes` (record cap re-calibrated from observed
    parquet bytes-per-row after each batch)."""
    roller = _SizeCalibratedRoller(
        path, partition_by, target_file_bytes, initial_records_per_file
    )
    return (
        df.writeStream.foreachBatch(roller)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(**_trigger_kwargs(trigger))
        .start()
    )


def write_console(
    df: DataFrame, label: str, trigger: str | None = None, num_rows: int = 20
) -> StreamingQuery:
    """S5: labeled console sink (print names 'immediately_known...' etc.,
    EnrichmentApp.java:97-103)."""
    return (
        df.writeStream.format("console")
        .queryName(label)
        .option("numRows", num_rows)
        .option("truncate", "false")
        .trigger(**_trigger_kwargs(trigger))
        .start()
    )


def write_memory(
    df: DataFrame, table_name: str, trigger: str | None = None
) -> StreamingQuery:
    """Test sink: results land in an in-memory table (batch≡stream
    equivalence checks read it back with spark.table)."""
    return (
        df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode("append" if not _has_aggregation(df) else "complete")
        .trigger(**_trigger_kwargs(trigger))
        .start()
    )


def _has_aggregation(df: DataFrame) -> bool:
    # session-window aggregations with watermark support append mode;
    # detect plain (un-watermarked) aggregates that need complete mode.
    plan = df._jdf.queryExecution().logical().toString()
    return "Aggregate" in plan and "EventTimeWatermark" not in plan


def write_kafka_csv(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
    transactional_id_prefix: str | None = None,
    trigger: str | None = None,
) -> StreamingQuery:
    """S8: Kafka producer sink (Generator.java:51-64 — string serializer,
    transactional-id prefix). Expects a `value` column (use
    csv_decode.encode_csv_value). Untestable without a broker."""
    writer = (
        df.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .trigger(**_trigger_kwargs(trigger))
    )
    if transactional_id_prefix is not None:
        writer = writer.option("kafka.transactional.id", transactional_id_prefix)
    return writer.start()


def fanout_union(dfs: list[DataFrame]) -> DataFrame:
    """S6/R4: route N result streams into ONE sink — union-before-write
    keeps a single committer on the output path (the Spark-safe form of
    the reference's two INSERTs into one sink table)."""
    return reduce(lambda a, b: a.unionByName(b), dfs)


def with_pipeline_metrics(df: DataFrame, name: str = "pipeline_metrics") -> DataFrame:
    """Attach per-micro-batch observability counters (`df.observe`):
    row count and null-enrichment count, surfaced on every
    StreamingQueryProgress under `observedMetrics[name]` — the Spark
    analogue of the reference's labeled console sinks + Flink metric
    groups (EnrichmentApp.java:97-103 is its only observability).
    Metrics ride the existing plan (an extra CollectMetrics node, no
    second pass / no extra shuffle) and work identically in batch via
    the QueryExecutionListener."""
    from pyspark.sql import functions as F

    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("msisdn").isNull(), 1)).alias("n_unenriched_msisdn"),
    )
