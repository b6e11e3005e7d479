"""Streaming Top-N — Flink SQL's ranking-over-changelog marquee
feature (`ROW_NUMBER() OVER (...) WHERE rn <= N` on a stream),
re-expressed in Spark's model: a complete-mode aggregation with a
global sort + limit. Spark re-emits the full (tiny, ≤ N-row) result
every trigger instead of retract/insert changelog rows — same final
answer, simpler consumer contract (documented divergence: Flink emits
deltas; consumers here read the latest snapshot).

State: the running per-key aggregate (bounded by key cardinality —
the same state Flink's rank operator keeps); the sort is over the
aggregate's output, never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery


def top_talkers(
    stream_df: DataFrame,
    key_cols: tuple[str, ...],
    k: int,
    weight_col: str | None = None,
) -> DataFrame:
    """Running top-k keys by count (or by sum(weight_col)). Write the
    result with `outputMode("complete")` — see `attach_memory`."""
    agg = (
        F.count(F.lit(1)).alias("metric")
        if weight_col is None
        else F.sum(weight_col).alias("metric")
    )
    counts = stream_df.groupBy(*[F.col(c) for c in key_cols]).agg(agg)
    return counts.orderBy(
        F.col("metric").desc(), *[F.col(c).asc() for c in key_cols]
    ).limit(k)


def attach_memory(
    topn: DataFrame, query_name: str, trigger_available_now: bool = True
) -> StreamingQuery:
    """Complete-mode memory sink: `spark.table(query_name)` always
    holds the CURRENT top-N snapshot."""
    w = topn.writeStream.format("memory").queryName(query_name).outputMode(
        "complete"
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
