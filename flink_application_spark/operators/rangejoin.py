"""Keyless point-in-interval range join via time-bucket blocking.

Spark has no native range-join optimization (that's a Databricks
runtime feature); a naive `points JOIN intervals ON start <= ts AND
ts < end` with NO equi key plans as BroadcastNestedLoopJoin — O(n·m)
comparisons, a scale killer when neither side is small.

The blocking trick turns it into an equi-join: quantize time into
buckets of `bucket_width` seconds, explode each interval onto every
bucket it covers, and join on bucket equality before re-applying the
exact predicate. A point lives in exactly ONE bucket, so every
qualifying (point, interval) pair is produced exactly once — no
dedup pass needed.

Scale properties:
- shuffle key = bucket → hash-partitioned equi-join (SMJ/SHJ), AQE
  can split hot buckets; no broadcast of either big side.
- interval replication = ceil(len/width)+1 rows; pick width near the
  typical interval length so replication stays ~2× and bucket
  population stays bounded.
- the exact predicate re-check runs post-join, scan-local.

(cf. the reference's equi+range lookup join,
/root/reference/src/main/java/org/example/EnrichmentApp.java Path B,
which always has an equi key; this operator covers the keyless case
its planner cannot.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(ts: Column, width_sec: int) -> Column:
    # epoch-µs (exact integers; UTC session pins the ntz→ts cast) →
    # integer bucket. µs magnitudes ≪ 2^53 so the double division is exact.
    us = F.unix_micros(ts.cast("timestamp"))
    return F.floor(us / F.lit(width_sec * 1_000_000)).cast("bigint")


def interval_point_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_width_sec: int = 1800,
    how: str = "inner",
) -> DataFrame:
    """Join each point to every interval with start <= ts < end,
    without any equi key, via bucket blocking. Column names must be
    disjoint between the two inputs (except none shared).

    Only INNER joins: the intervals side is exploded onto every bucket
    it covers, so an outer join would emit one null-padded row per
    covered bucket for unmatched intervals — silently breaking the
    exactly-once guarantee. Outer semantics need a post-join anti-join
    against the matched set instead."""
    if how != "inner":
        raise ValueError(
            f"interval_point_join supports how='inner' only, got {how!r} "
            "(outer joins would duplicate unmatched intervals per bucket)"
        )
    b_pt = points.withColumn("_bucket", _bucket(F.col(ts_col), bucket_width_sec))
    b_iv = intervals.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket_width_sec),
                _bucket(F.col(end_col), bucket_width_sec),
            )
        ),
    )
    joined = b_pt.join(
        b_iv,
        on=(
            (b_pt["_bucket"] == b_iv["_bucket"])
            & (F.col(start_col) <= F.col(ts_col))
            & (F.col(ts_col) < F.col(end_col))
        ),
        how=how,
    )
    return joined.drop("_bucket")
