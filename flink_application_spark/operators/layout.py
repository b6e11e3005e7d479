"""Z-order (Morton) data layout — the multi-dimensional clustering
Delta Lake / Iceberg expose as Z-ORDER, built on open Spark.

Why it matters at 100 TB: parquet prunes row groups by min/max
statistics PER FILE/ROW GROUP. A table sorted on one column prunes
filters on that column only; a 2-D box predicate (user AND value,
tenant AND time) scans everything for the second dimension. Sorting
by the interleaved-bit Morton code of both columns makes every file a
tight rectangle in (a, b) space, so min/max stats prune BOTH
dimensions — the difference between reading a few files and reading
the table.

Everything is Catalyst expressions: the Morton code is a static sum
of shift/mask terms (whole-stage codegen, no Python), the layout
write is repartitionByRange + sortWithinPartitions on the code (one
range shuffle — the same cost as any global sort), and the pruning
benefit is MEASURED from parquet footers (`rowgroup_prune_fraction`),
not asserted by vibes: tests/test_layout.py requires the z-layout to
keep strictly fewer candidate row groups than a 1-D layout for a box
predicate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "morton_interleave",
    "zorder_frame",
    "write_zordered",
    "rowgroup_prune_fraction",
]


def morton_interleave(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low `bits` bits of two non-negative ints:
    result bit 2i = bit i of `a`, bit 2i+1 = bit i of `b`. A static
    shift/mask sum — stays in whole-stage codegen."""
    if not (1 <= bits <= 31):
        raise ValueError(f"bits must be in [1, 31], got {bits}")
    terms = None
    for i in range(bits):
        t = (
            F.shiftleft(F.shiftright(a.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(
                F.shiftright(b.cast("bigint"), i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
        terms = t if terms is None else terms + t
    return terms.cast("bigint")


def _scaled(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Min/max-scale a numeric column onto [0, 2^bits - 1] integers."""
    span = max(hi - lo, 1e-300)
    top = (1 << bits) - 1
    return F.least(
        F.lit(top).cast("bigint"),
        F.greatest(
            F.lit(0).cast("bigint"),
            F.floor((col.cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top)).cast(
                "bigint"
            ),
        ),
    )


def zorder_frame(
    df: DataFrame, col_a: str, col_b: str, bits: int = 16
) -> DataFrame:
    """Attach the `_z` Morton key for (col_a, col_b), min/max-scaled.

    The scaling bounds come from one tiny 4-value aggregate (a
    corpus-size-independent driver scalar, same altitude as the PCA
    eigen step); rows with NULL in either column get _z = -1 and sort
    together at the front."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).collect()[0]
    z = morton_interleave(
        _scaled(F.col(col_a), float(lo_a), float(hi_a), bits),
        _scaled(F.col(col_b), float(lo_b), float(hi_b), bits),
        bits,
    )
    return df.withColumn(
        "_z",
        F.when(
            F.col(col_a).isNotNull() & F.col(col_b).isNotNull(), z
        ).otherwise(F.lit(-1)),
    )


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    *,
    n_files: int = 32,
    bits: int = 16,
) -> None:
    """Write `df` as parquet clustered by the (col_a, col_b) Morton
    code: range-partition on _z (one shuffle), sort within partitions,
    one file per partition — every file covers a tight z-interval,
    i.e. a small rectangle in (a, b) space, so parquet min/max footer
    stats prune box predicates on BOTH columns."""
    (
        zorder_frame(df, col_a, col_b, bits)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroup_prune_fraction(
    path: str, ranges: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(surviving_row_groups, total_row_groups) for a box predicate,
    judged EXACTLY the way a min/max-stats reader does: a row group
    survives if its [min, max] interval overlaps every queried range.
    Reads only parquet footers (pyarrow) — this is the measurement
    that proves a layout actually prunes, independent of any engine's
    metric plumbing."""
    import glob as _glob
    import os

    import pyarrow.parquet as pq

    files = sorted(
        _glob.glob(os.path.join(path, "*.parquet"))
        + _glob.glob(os.path.join(path, "**", "*.parquet"))
    )
    total = survive = 0
    for f in files:
        meta = pq.ParquetFile(f).metadata
        schema_names = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        } if meta.num_row_groups else {}
        for rg in range(meta.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in ranges.items():
                st = meta.row_group(rg).column(schema_names[col]).statistics
                if st is None or st.min is None or st.max is None:
                    continue  # no stats → reader must keep the group
                if st.max < lo or st.min > hi:
                    ok = False
                    break
            survive += int(ok)
    return survive, total
