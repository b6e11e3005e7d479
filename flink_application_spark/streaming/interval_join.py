"""Stream-stream event-time interval join.

The reference's Path-B join (EnrichmentApp.java:320-340) is an
equi+range theta join against a *static* dimension; its true streaming
generalization — both sides unbounded — is Flink's interval join. Spark
expresses it as a stream-stream inner/outer join whose condition pairs
the equi-keys with a bounded event-time band, plus watermarks on BOTH
sides so the state store can evict rows that can no longer match:

    left.ts  ∈ [right.ts + lower, right.ts + upper]

Scale design: state size is O(input rate × band width). The watermark
delay must cover the band plus expected disorder — too small drops
late matches, too large grows state linearly. Both sides shuffle on the
equi-key, so the join is hash-co-located; the time band is evaluated as
a post-filter within each key group, and Spark derives state-eviction
thresholds from the band bounds (a one-sided band keeps state forever —
always bound both ends).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: Column,
    *,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    left_watermark: str,
    right_watermark: str,
    how: str = "inner",
) -> DataFrame:
    """Join two (streaming or batch) DataFrames on `on` AND
    ``left_ts ∈ [right_ts - lower, right_ts + upper]``.

    `lower`/`upper` are positive interval strings (e.g. "10 seconds");
    column names must be disjoint between the two sides (rename before
    joining — required anyway for stream-stream joins to keep the
    output schema unambiguous). Watermarks are applied here so the
    same call works on batch frames (watermark is a no-op in batch),
    keeping batch-vs-stream equivalence testable on one code path.
    """
    lhs = left.withWatermark(left_ts, left_watermark) if left.isStreaming else left
    rhs = right.withWatermark(right_ts, right_watermark) if right.isStreaming else right
    band = (
        F.col(left_ts) >= F.expr(f"{right_ts} - INTERVAL {lower}")
    ) & (F.col(left_ts) <= F.expr(f"{right_ts} + INTERVAL {upper}"))
    return lhs.join(rhs, on & band, how)
