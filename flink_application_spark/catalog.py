"""Table loading / view registration for the driver's parquet testdata.

Tables (TESTDATA.md): region nation customer supplier part orders
lineitem events documents embeddings — one parquet file each under a
scale-factor directory.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # Normalize events.ts to timestamp_ntz regardless of how the driver
        # generated it. Historically it has been TIMESTAMP(NANOS) surfaced as
        # long ns (via nanosAsLong); current testdata stores timestamp[us]
        # directly. Branch on the physical type so both generations load.
        # For the long-ns form, `div` (integer division) floors to µs —
        # matching DuckDB's truncation — and avoids the double-precision
        # corruption float division would cause on epoch-ns magnitudes.
        ts_type = dict(df.dtypes)["ts"]
        if ts_type in ("bigint", "long"):
            df = df.withColumn(
                "ts",
                F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)"),
            )
        elif ts_type != "timestamp_ntz":
            # timestamp -> timestamp_ntz keeps the wall clock ONLY because
            # session.get_spark pins spark.sql.session.timeZone=UTC; a
            # session built elsewhere would shift ts by its local offset.
            # Always construct sessions through get_spark.
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


def fan_out(df: DataFrame) -> DataFrame:
    """Repartition up to defaultParallelism when the input arrives in
    fewer partitions — the driver testdata parquet files are ONE row
    group each (unsplittable), so any expensive per-row stage chained
    onto a raw scan runs on a single core. Cost is one small
    round-robin shuffle of the projected columns; at 100 TB the scan
    is already multi-split and this is a no-op. Use on the INPUT of
    interpreted-HOF / Arrow stages, not blanket in the catalog (a
    blanket repartition taxes every cheap query with a shuffle)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def register_views(
    spark: SparkSession, sf_dir: str, tables: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    """Register each table as a temp view named after the table.

    Views are session-scoped; re-registering with a different sf_dir
    re-points them (used by tests that sweep scale factors).
    """
    out: dict[str, DataFrame] = {}
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
