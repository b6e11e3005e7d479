"""CDR generator as a registered Spark data source (Python DataSource
API, Spark 4): `spark.read.format("cdrgen")` — the reference's
`DataGeneratorSource` (Generator.java:38-47) as a first-class
*pluggable source* instead of a helper function.

The existing `sources/generator.py` path (spark.range → synthesize)
stays the production path — it runs entirely JVM-side. This source
exists for the *connector surface*: the same record schema and null
distributions, but behind Spark's source registry, partition-parallel
(each InputPartition generates a disjoint row range), and usable from
pure SQL (`CREATE TABLE ... USING cdrgen` / `spark.read.format`).

Determinism: row i's fields derive from md5(seed, i) — no RNG state,
so any partitioning of [0, n) yields the same multiset, executors
never coordinate, and a retried task regenerates identical rows
(exactly-once under speculation comes free).
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

# Reference generator operating points (CsvData.java:129-152, flink.conf:5-10).
PROBES = ["DE", "cl", "ek", "ir", "kg", "kh", "mn", "nn", "ns", "rd", "sp", "sr", "st", "vr", "yd"]
START_MIN_MS = 1_653_475_440_000
START_MAX_MS = 1_779_705_840_000

SCHEMA = (
    "start_time timestamp, measuring_probe_name string, imsi bigint, "
    "msisdn bigint, ms_ip_address string, unique_cdr_id bigint"
)


def _h(seed: int, i: int, field: str) -> int:
    """Stateless per-(row, field) uniform 64-bit draw."""
    d = hashlib.md5(f"{seed}|{i}|{field}".encode()).digest()
    return int.from_bytes(d[:8], "big")


@dataclass
class _Range(InputPartition):
    start: int
    end: int


def _row(seed: int, i: int, imsi_p: float, msisdn_p: float) -> tuple:
    """Row i of the deterministic CDR stream — shared by the batch and
    streaming readers, so the streaming source replays EXACTLY the
    batch rows (offset ranges are row-index ranges)."""
    import datetime as dt

    span = START_MAX_MS - START_MIN_MS
    ts_ms = START_MIN_MS + _h(seed, i, "ts") % span
    ts = dt.datetime.fromtimestamp(ts_ms / 1000, dt.timezone.utc)
    probe = PROBES[_h(seed, i, "probe") % len(PROBES)] + "..."
    subscriber = 100_000 + i % 1000
    imsi = (
        250_000_000_000 + subscriber
        if (_h(seed, i, "imsi") % 1_000_000) / 1_000_000 < imsi_p
        else None
    )
    msisdn = (
        79_000_000_000 + subscriber
        if (_h(seed, i, "msisdn") % 1_000_000) / 1_000_000 < msisdn_p
        else None
    )
    ip = f";10.{subscriber % 256}.{(subscriber // 256) % 256}.{1 + i % 2};"
    uid = 1_700_000_000_000 + (i // 100) * 1_000_000 + _h(seed, i, "uid") % 1_000_000
    return (ts, probe, imsi, msisdn, ip, uid)


class CdrGenReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.seed = int(options.get("seed", 42))
        self.num_partitions = int(options.get("numpartitions", 8))
        self.imsi_p = float(options.get("imsinotnullprobability", 0.5))
        self.msisdn_p = float(options.get("msisdnnotnullprobability", 0.1))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n // self.num_partitions))
        return [
            _Range(lo, min(lo + step, self.n)) for lo in range(0, self.n, step)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(self.seed, i, self.imsi_p, self.msisdn_p)


class CdrGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the generator — the reference's rate-limited
    `DataGeneratorSource` as a Structured Streaming source
    (`spark.readStream.format("cdrgen")`).

    Offsets are ROW INDICES (`{"i": n}`): each micro-batch emits the
    next `rowsperbatch` rows; `readBetweenOffsets` regenerates any
    offset range bit-identically (md5-derived rows, no RNG state), so
    checkpoint replay re-emits exactly the same rows — exactly-once
    without any source-side bookkeeping. Optional `maxrows` makes the
    source finite (read() stops advancing the offset), which lets
    availableNow/tests drain it deterministically."""

    def __init__(self, options: dict):
        self.seed = int(options.get("seed", 42))
        self.rows_per_batch = int(options.get("rowsperbatch", 100))
        self.max_rows = int(options.get("maxrows", -1))
        self.imsi_p = float(options.get("imsinotnullprobability", 0.5))
        self.msisdn_p = float(options.get("msisdnnotnullprobability", 0.1))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        i0 = int(start["i"])
        end = i0 + self.rows_per_batch
        if self.max_rows >= 0:
            end = min(end, self.max_rows)
        if end <= i0:
            return iter(()), {"i": i0}
        return (
            iter([_row(self.seed, i, self.imsi_p, self.msisdn_p) for i in range(i0, end)]),
            {"i": end},
        )

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for i in range(int(start["i"]), int(end["i"])):
            yield _row(self.seed, i, self.imsi_p, self.msisdn_p)


class CdrGenDataSource(DataSource):
    """`spark.read.format("cdrgen").option("n", 10000).load()` or
    `spark.readStream.format("cdrgen").option("rowsPerBatch", 500)`."""

    @classmethod
    def name(cls) -> str:
        return "cdrgen"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> CdrGenReader:
        return CdrGenReader(self.options)

    def simpleStreamReader(self, schema) -> CdrGenStreamReader:
        return CdrGenStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(CdrGenDataSource)
