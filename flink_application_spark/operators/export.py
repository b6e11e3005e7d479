"""Training-shard export: materialize a shuffled corpus as one
parquet directory per shard — the file layout a data-loader consumes
(shard = unit of worker assignment; in-shard order = sample order).

Built on the deterministic epoch shuffle
(`plans/training_prep_queries.py`): shard ids are contiguous rank
ranges, so `repartition("shard")` gives each output task whole shards
and `partitionBy("shard")` lays them out as `shard=N/` directories.
`sortWithinPartitions("shard", "offset_in_shard")` makes row order
inside every file the sample order (parquet preserves write order
within a file; the loader reads one shard's files in name order).

Scale: one hash shuffle on shard id (uniform by construction — every
shard has exactly `docs_per_shard` rows), then embarrassingly
parallel writes. Re-running with a different epoch salt reshuffles
without touching the reader contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def with_epoch_shards(
    df: DataFrame,
    id_col: str,
    epoch: int,
    docs_per_shard: int,
) -> DataFrame:
    """Append (shard, offset_in_shard) from the md5 epoch permutation."""
    k = F.md5(F.concat(F.lit(f"epoch{epoch}:"), F.col(id_col).cast("string")))
    rn = (
        F.row_number().over(Window.orderBy(k, F.col(id_col))).cast("bigint") - 1
    )
    return (
        df.withColumn("_rn", rn)
        .withColumn("shard", (F.col("_rn") / docs_per_shard).cast("bigint"))
        .withColumn("offset_in_shard", F.col("_rn") % docs_per_shard)
        .drop("_rn")
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    id_col: str = "doc_id",
    epoch: int = 1,
    docs_per_shard: int = 64,
) -> int:
    """Write `path/shard=N/` parquet directories in sample order;
    returns the shard count."""
    sharded = with_epoch_shards(df, id_col, epoch, docs_per_shard)
    (
        sharded.repartition("shard")
        .sortWithinPartitions("shard", "offset_in_shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    return sharded.select("shard").distinct().count()


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard in sample order (partition pruning serves the single
    directory; the explicit sort restores order across its files)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("shard") == shard)
        .orderBy("offset_in_shard")
    )
