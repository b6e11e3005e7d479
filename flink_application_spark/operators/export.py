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

from flink_application_spark.operators.twophase import (
    partition_bases,
    ranged_with_pid,
    with_base_offsets,
)


def with_epoch_shards(
    df: DataFrame,
    id_col: str,
    epoch: int,
    docs_per_shard: int,
) -> DataFrame:
    """Append (shard, offset_in_shard) from the md5 epoch permutation.

    The global rank is computed the scale-safe way: an unpartitioned
    `row_number() OVER (ORDER BY ...)` window funnels the whole corpus
    through ONE task (Spark warns 'No Partition Defined for Window
    operation'), so instead the rows are range-partitioned on the key
    (PINNED — operators/twophase.ranged_with_pid), ranked WITHIN each
    partition, and shifted by the partition-prefix counts (a
    zipWithIndex on DataFrames — the per-partition counts are the only
    driver-side state, one long per partition). The resulting rank is
    the position in the total (key, id) order, identical whatever the
    partition boundaries were, so the permutation stays deterministic
    across runs and retries."""
    k = F.md5(F.concat(F.lit(f"epoch{epoch}:"), F.col(id_col).cast("string")))
    n_parts = df.sparkSession.sparkContext.defaultParallelism
    ranged = ranged_with_pid(
        df.withColumn("_k", k), n_parts, [F.col("_k"), F.col(id_col)]
    )
    base, _n = partition_bases(ranged, F.count(F.lit(1)))
    withb = with_base_offsets(ranged, base, "_boff")
    w = Window.partitionBy("_pid").orderBy("_k", id_col)
    rn = (F.row_number().over(w).cast("bigint") - 1) + F.col("_boff")
    return (
        withb.withColumn("_rn", rn)
        # integer div, not float: exact past 2^53 ranks (bit-equal to
        # the old double-divide cast below that)
        .withColumn("shard", F.expr(f"_rn div {int(docs_per_shard)}"))
        .withColumn("offset_in_shard", F.col("_rn") % docs_per_shard)
        .drop("_rn", "_k", "_pid", "_boff")
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
    # shard count is ceil(n/docs_per_shard) BY CONSTRUCTION (contiguous
    # rank ranges) — derived from the WRITTEN output's row count, not a
    # re-run of the rank job
    n = df.sparkSession.read.parquet(path).count()
    return (n + docs_per_shard - 1) // docs_per_shard


def read_shard(spark: SparkSession, path: str, shard: int) -> DataFrame:
    """One shard in sample order (partition pruning serves the single
    directory; the explicit sort restores order across its files)."""
    return (
        spark.read.parquet(path)
        .filter(F.col("shard") == shard)
        .orderBy("offset_in_shard")
    )
