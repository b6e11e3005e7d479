"""Config-driven enrichment application — the reference's main-class
shape (EnrichmentApp.main, EnrichmentApp.java:36-56: load config →
build environment → declare pipeline → execute).

The reference uses typesafe-HOCON (flink.conf); we accept a JSON file
or dict with the same operational knobs (section names kept close to
flink.conf's so a reference operator can map their deployment 1:1):

{
  "mode": "batch" | "streaming",
  "source": {"format": "parquet"|"csv-lines", "path": ...,
             "kafka": {"bootstrap": ..., "topic": ...}},   # optional
  "dims":   {"imsi_msisdn": <path>, "ms_ip": <path>},
  "sink":   {"format": "parquet"|"console"|"memory", "path": ...,
             "checkpoint": ..., "partition_by": ["event_date","probe"],
             "trigger": "20 seconds", "name": ...},
  "dedup":  {"gap": "1 second", "watermark": "2 seconds"},
  "path_a_how": "inner" | "left"
}

Batch and streaming share the pipeline (streaming_enrichment works on
both; its session dedup runs as a batch aggregation in batch mode).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from flink_application_spark.sources.streams import (
    csv_line_stream,
    file_stream,
    kafka_csv_stream,
)
from flink_application_spark.streaming.pipeline import streaming_enrichment
from flink_application_spark.streaming.sinks import (
    write_console,
    write_memory,
    write_partitioned_parquet,
)


def load_config(path_or_dict: str | dict[str, Any]) -> dict[str, Any]:
    if isinstance(path_or_dict, dict):
        return path_or_dict
    with open(path_or_dict) as f:
        return json.load(f)


def _parse_specific_offsets(v: Any) -> dict[int, int] | None:
    """Accept {partition: offset} dicts or Flink's string form
    'partition:0,offset:42;partition:1,offset:300'
    (flink.conf scan.startup.specific-offsets syntax)."""
    if v is None or isinstance(v, dict):
        return v
    out: dict[int, int] = {}
    for chunk in str(v).split(";"):
        if not chunk.strip():
            continue
        fields = dict(
            kv.strip().split(":", 1) for kv in chunk.split(",") if ":" in kv
        )
        out[int(fields["partition"])] = int(fields["offset"])
    return out


def build_source(spark: SparkSession, cfg: dict[str, Any]) -> DataFrame:
    src = cfg["source"]
    streaming = cfg.get("mode", "batch") == "streaming"
    fmt = src.get("format", "parquet")
    if "kafka" in src:
        k = src["kafka"]
        return kafka_csv_stream(
            spark,
            k["bootstrap"],
            k["topic"],
            group_id=k.get("group_id"),
            startup_mode=k.get("scan.startup.mode", "latest-offset"),
            timestamp_ms=k.get("scan.startup.timestamp-millis"),
            specific_offsets=_parse_specific_offsets(
                # accept the flink.conf-style key (documented surface)
                # with a python-friendly alias
                k.get("scan.startup.specific-offsets", k.get("specific_offsets"))
            ),
        )
    if fmt == "csv-lines":
        if streaming:
            return csv_line_stream(spark, src["path"])
        from flink_application_spark.sources.csv_decode import decode_csv_value

        return decode_csv_value(spark.read.text(src["path"]))
    if streaming:
        return file_stream(spark, src["path"], fmt=fmt)
    return spark.read.format(fmt).load(src["path"])


def build_pipeline(spark: SparkSession, cfg: dict[str, Any]) -> DataFrame:
    src = build_source(spark, cfg)
    dims = cfg["dims"]
    imsi_msisdn = spark.read.parquet(dims["imsi_msisdn"])
    ms_ip = spark.read.parquet(dims["ms_ip"])
    dd = cfg.get("dedup", {})
    return streaming_enrichment(
        src,
        imsi_msisdn,
        ms_ip,
        path_a_how=cfg.get("path_a_how", "inner"),
        gap=dd.get("gap", "1 second"),
        watermark_delay=dd.get("watermark", "2 seconds"),
    )


def run(spark: SparkSession, config: str | dict[str, Any]):
    """Execute the configured pipeline. Batch: returns the result
    DataFrame (caller writes/collects). Streaming: starts the sink
    query and returns the StreamingQuery handle."""
    cfg = load_config(config)
    result = build_pipeline(spark, cfg)
    sink = cfg.get("sink", {"format": "console"})
    if cfg.get("mode", "batch") != "streaming":
        return result
    fmt = sink.get("format", "console")
    if fmt == "parquet":
        # flink.conf parity: sink.rolling-policy.file-size selects the
        # byte-size-calibrated roller (flink.conf:54-55, 110 MB)
        roll_bytes = sink.get("sink.rolling-policy.file-size")
        if roll_bytes is not None:
            from flink_application_spark.streaming.sinks import (
                write_partitioned_parquet_size_rolled,
            )

            return write_partitioned_parquet_size_rolled(
                result,
                sink["path"],
                checkpoint=sink["checkpoint"],
                partition_by=tuple(sink.get("partition_by", ("event_date", "probe"))),
                target_file_bytes=int(roll_bytes),
                trigger=sink.get("trigger", "20 seconds"),
                query_name=sink.get("name", "enrichment_sink"),
            )
        return write_partitioned_parquet(
            result,
            sink["path"],
            checkpoint=sink["checkpoint"],
            partition_by=tuple(sink.get("partition_by", ("event_date", "probe"))),
            trigger=sink.get("trigger", "20 seconds"),
            query_name=sink.get("name", "enrichment_sink"),
        )
    if fmt == "memory":
        return write_memory(result, sink.get("name", "enrichment_out"), trigger=sink.get("trigger"))
    return write_console(result, sink.get("name", "enrichment"), trigger=sink.get("trigger"))


def main(argv: list[str] | None = None) -> None:  # pragma: no cover - thin CLI
    import sys

    from flink_application_spark.session import get_spark

    args = argv if argv is not None else sys.argv[1:]
    if not args:
        raise SystemExit("usage: python -m flink_application_spark.app <config.json>")
    spark = get_spark("flink-application-spark")
    out = run(spark, args[0])
    if isinstance(out, DataFrame):
        out.show(20, truncate=False)
    else:
        out.awaitTermination()


if __name__ == "__main__":  # pragma: no cover
    main()
