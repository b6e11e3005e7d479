"""Shared machinery for the two-phase distributed scan — the pattern
behind `operators/ranks.global_row_number` (global rank),
`operators/packing._with_offsets_two_phase` (prefix sum) and
`operators/export.with_epoch_shards` (epoch shards):

1. range-partition on the order key and stamp `spark_partition_id()`;
2. **pin the partitioning** (persist + materialize —
   `ranged_with_pid`'s docstring has the fault-tolerance rationale):
   RangePartitioner
   draws its boundaries by reservoir sampling, so two separate
   executions of the same *unpersisted* `repartitionByRange` plan may
   split rows differently once the input outgrows the sample. The
   per-pid offsets collected in step 3 would then be attached to
   DIFFERENT partitions in step 4, silently corrupting every rank /
   prefix sum. Materializing once freezes the boundaries, makes every
   downstream job (the offsets collect AND the caller's final
   consumption) read the identical rows, and — as a side effect —
   bounds the whole computation to ONE upstream execution (pinned by
   an accumulator in tests/test_ranks.py);
3. collect one aggregate row per partition; exclusive-prefix them
   into base offsets on the driver (#partitions rows of driver state);
4. attach the bases back per row: a `create_map` literal for small
   partition counts, a broadcast-joined (pid, base) frame above
   `LITERAL_BASE_MAX` — a literal map inlines one expression pair per
   partition into the plan, which is megabytes of expression tree at
   cluster partition counts (10^5+). Both paths are bit-equal
   (tests/test_ranks.py, tests/test_packing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "LITERAL_BASE_MAX",
    "ranged_with_pid",
    "partition_bases",
    "with_base_offsets",
]

# Above this partition count the base offsets attach via broadcast
# join instead of a create_map literal (plan-size guard; outputs are
# bit-equal either way).
LITERAL_BASE_MAX = 1024


def ranged_with_pid(
    df: DataFrame, n_part: int, order: list[Column]
) -> DataFrame:
    """Range-partition `df` on `order` into `n_part` partitions, stamp
    `_pid`, and PIN the result so the offsets collect and the final
    window provably see one partitioning.

    The pin is persist(MEMORY_AND_DISK) + an eager materialization,
    NOT localCheckpoint: both freeze the boundaries (the range
    sampler's output is embedded in the materialized RDD's fixed
    ShuffleDependency, so even a cache-evicted or executor-lost block
    recomputes into the SAME partitions), but localCheckpoint blocks
    are non-recomputable — one lost executor between the pin and the
    caller's final consumption would abort the whole job at exactly
    the cluster scale this module targets. No unpersist hook is
    exposed on purpose: releasing the cache while the returned frame
    is still unconsumed would let a replan re-sample new boundaries
    against the already-collected offsets (the corruption this
    function exists to prevent); blocks are reclaimed by the
    ContextCleaner when the frame is garbage-collected, exactly like
    the localCheckpoint form."""
    from pyspark import StorageLevel

    parted = (
        df.repartitionByRange(n_part, *order)
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    parted.count()  # materialize: every later job reads these blocks
    return parted


def partition_bases(
    parted: DataFrame, agg: Column
) -> tuple[dict[int, int], int]:
    """Per-partition aggregate of `agg` → exclusive-prefix base
    offsets. Returns (bases by pid, grand total). Driver-side state is
    one row per partition; NULL aggregates (empty partitions under
    `sum`) count as 0."""
    vals = {
        r["_pid"]: int(r["_v"] or 0)
        for r in parted.groupBy("_pid").agg(agg.alias("_v")).collect()
    }
    base: dict[int, int] = {}
    acc = 0
    for pid in sorted(vals):
        base[pid] = acc
        acc += vals[pid]
    return base, acc


def with_base_offsets(
    parted: DataFrame,
    base: dict[int, int],
    out_col: str,
    literal_max: int | None = None,
) -> DataFrame:
    """Attach each row's partition base offset as bigint `out_col`.
    `literal_max` overrides `LITERAL_BASE_MAX` (tests force the
    broadcast-join path with 0)."""
    limit = LITERAL_BASE_MAX if literal_max is None else literal_max
    if not base:
        return parted.withColumn(out_col, F.lit(0).cast("bigint"))
    if len(base) <= limit:
        m = F.create_map(
            *[
                x
                for pid in sorted(base)
                for x in (F.lit(pid), F.lit(base[pid]).cast("bigint"))
            ]
        )
        return parted.withColumn(
            out_col, F.element_at(m, F.col("_pid")).cast("bigint")
        )
    cols = parted.columns
    offsets = parted.sparkSession.createDataFrame(
        sorted((int(p), int(b)) for p, b in base.items()),
        "_pid int, _tp_base bigint",
    )
    return (
        parted.join(F.broadcast(offsets), "_pid", "left")
        .withColumn(
            out_col, F.coalesce(F.col("_tp_base"), F.lit(0)).cast("bigint")
        )
        .select(*cols, out_col)
    )
