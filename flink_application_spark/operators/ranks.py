"""Distributed global ranking — `row_number() OVER (ORDER BY ...)`
without the single-task global sort.

A partition-less window moves EVERY row to one task (the "No
Partition Defined for Window" warning; the plan doctor's
GLOBAL_WINDOW finding). Top-k callers should use orderBy+limit
(TakeOrdered) instead — but some computations need the FULL ranking
(Gini's Σ i·c_i, ntile curriculum buckets, percentile assignment).
For those, this is the standard two-phase scan, the rank analogue of
`operators/packing._with_offsets_two_phase`:

1. range-partition by the sort key (one shuffle — same volume the
   global sort would move, but into N sorted partitions instead of 1);
2. per-partition row counts → driver (one row per partition) →
   broadcast base offsets;
3. per-partition local row_number + base.

Output is bit-identical to the single-task window whenever the order
is TOTAL (callers must include a unique tie-break column — every
registry orderBy does): global rank is partitioning-independent by
definition. Pinned in tests/test_ranks.py, including equality with
the window form and invariance under input partitioning.

Siblings, kept separate on purpose: `operators/export._epoch_shards`
(same two-phase rank, but persists the ranged intermediate and hands
the cache handle back because its caller re-reads it for the shard
write) and `operators/packing._with_offsets_two_phase` (prefix SUM
rather than rank). All three share the pattern; their state/caching
contracts differ."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def global_row_number(
    df: DataFrame, order: list[Column], out_col: str = "rn"
) -> DataFrame:
    """Add `out_col` = 1-based global rank under `order` (must be a
    total order — include a unique tie-break)."""
    n_part = max(df.sparkSession.sparkContext.defaultParallelism, 1)
    parted = df.repartitionByRange(n_part, *order).withColumn(
        "_pid", F.spark_partition_id()
    )
    counts = {
        r["_pid"]: r["c"]
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    base: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        base[pid] = acc
        acc += counts[pid]
    base_col = (
        F.element_at(
            F.create_map(
                *[x for pid in sorted(base) for x in (F.lit(pid), F.lit(base[pid]))]
            ),
            F.col("_pid"),
        )
        if base
        else F.lit(0)
    )
    local = F.row_number().over(Window.partitionBy("_pid").orderBy(*order))
    return parted.withColumn(
        out_col, (base_col + local).cast("bigint")
    ).drop("_pid")


def global_ntile(
    df: DataFrame, order: list[Column], n_buckets: int, out_col: str = "bucket"
) -> DataFrame:
    """Distributed `ntile(n) OVER (ORDER BY ...)`: derived from the
    two-phase global rank with the standard SQL ntile split (the first
    N mod n buckets hold ceil(N/n) rows, the rest floor(N/n)) — the
    exact semantics Spark's and DuckDB's ntile implement, so swapping
    this in changes no output (pinned in tests/test_ranks.py)."""
    ranked = global_row_number(df, order, "_gnt_rn")
    n = ranked.count()
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
