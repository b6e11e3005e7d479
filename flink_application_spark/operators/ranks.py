"""Distributed global ranking — `row_number() OVER (ORDER BY ...)`
without the single-task global sort.

A partition-less window moves EVERY row to one task (the "No
Partition Defined for Window" warning; the plan doctor's
GLOBAL_WINDOW finding). Top-k callers should use orderBy+limit
(TakeOrdered) instead — but some computations need the FULL ranking
(Gini's Σ i·c_i, ntile curriculum buckets, percentile assignment).
For those, this is the standard two-phase scan, built on the shared
`operators/twophase` helpers:

1. range-partition by the sort key (one shuffle — same volume the
   global sort would move, but into N sorted partitions instead
   of 1), PINNED via persist+materialize so every downstream job sees
   the identical partitioning (RangePartitioner samples its boundaries
   — an unpersisted plan may split rows differently across jobs;
   twophase.ranged_with_pid documents why persist, not localCheckpoint);
2. per-partition row counts → driver (one row per partition) →
   base offsets (create_map literal, or a broadcast join above
   `twophase.LITERAL_BASE_MAX` partitions);
3. per-partition local row_number + base.

Output is bit-identical to the single-task window whenever the order
is TOTAL (callers must include a unique tie-break column — every
registry orderBy does): global rank is partitioning-independent by
definition. Pinned in tests/test_ranks.py, including equality with
the window form, invariance under input partitioning, and a
one-upstream-execution accumulator check.

Siblings on the same helpers, kept separate on purpose:
`operators/export.with_epoch_shards` (two-phase rank over the md5 epoch
key) and `operators/packing._with_offsets_two_phase` (prefix SUM
rather than rank)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from flink_application_spark.operators.twophase import (
    partition_bases,
    ranged_with_pid,
    with_base_offsets,
)


def _global_row_number_n(
    df: DataFrame,
    order: list[Column],
    out_col: str,
    *,
    n_partitions: int | None = None,
    literal_max: int | None = None,
) -> tuple[DataFrame, int]:
    """`global_row_number` plus the total row count N — the counts
    collect already knows it, so callers that need N (ntile) must not
    pay a second execution for it."""
    n_part = n_partitions or max(
        df.sparkSession.sparkContext.defaultParallelism, 1
    )
    parted = ranged_with_pid(df, n_part, order)
    base, n = partition_bases(parted, F.count(F.lit(1)))
    withb = with_base_offsets(parted, base, "_gr_base", literal_max)
    local = F.row_number().over(Window.partitionBy("_pid").orderBy(*order))
    out = withb.withColumn(
        out_col, (F.col("_gr_base") + local).cast("bigint")
    ).drop("_pid", "_gr_base")
    return out, n


def global_row_number(
    df: DataFrame,
    order: list[Column],
    out_col: str = "rn",
    *,
    n_partitions: int | None = None,
    literal_max: int | None = None,
) -> DataFrame:
    """Add `out_col` = 1-based global rank under `order` (must be a
    total order — include a unique tie-break)."""
    return _global_row_number_n(
        df, order, out_col, n_partitions=n_partitions, literal_max=literal_max
    )[0]


def global_ntile(
    df: DataFrame,
    order: list[Column],
    n_buckets: int,
    out_col: str = "bucket",
    *,
    n_partitions: int | None = None,
    literal_max: int | None = None,
) -> DataFrame:
    """Distributed `ntile(n) OVER (ORDER BY ...)`: derived from the
    two-phase global rank with the standard SQL ntile split (the first
    N mod n buckets hold ceil(N/n) rows, the rest floor(N/n)) — the
    exact semantics Spark's and DuckDB's ntile implement, so swapping
    this in changes no output (pinned in tests/test_ranks.py).

    N comes from the rank phase's own per-partition counts — no extra
    `count()` job, and the pinned frame means ONE upstream execution
    for the whole call (round-6 verdict item)."""
    ranked, n = _global_row_number_n(
        df, order, "_gnt_rn", n_partitions=n_partitions, literal_max=literal_max
    )
    size, rem = divmod(n, n_buckets)
    big = rem * (size + 1)
    if size == 0:
        # fewer rows than buckets: row r lands in bucket r
        bucket = F.col("_gnt_rn")
    else:
        # integer div on purpose — no float near bucket boundaries
        bucket = F.when(
            F.col("_gnt_rn") <= F.lit(big),
            F.expr(f"(_gnt_rn - 1) div {size + 1} + 1"),
        ).otherwise(F.expr(f"{rem} + (_gnt_rn - {big} - 1) div {size} + 1"))
    return ranked.withColumn(out_col, bucket.cast("int")).drop("_gnt_rn")
