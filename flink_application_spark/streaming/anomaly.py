"""Streaming z-score anomaly detection with mergeable moment state.

The batch form (`events_anomaly_zscore`) computes per-type mean/std
over the whole table and flags |x − μ|/σ ≥ k. The streaming form must
score events as they arrive, against the history SEEN SO FAR — without
re-scanning it. The enabling fact: the sufficient statistics
(n, Σx, Σx²) are ADDITIVE per key, so each micro-batch commits its
own per-type partial row and history is a 3-column sum at read time —
state is O(|key space|) per batch, independent of event volume.

Semantics (deliberate, documented): batch N's events are scored
against the moments of batches < N — the online definition (an
anomaly is judged by what was known BEFORE it arrived). The first
batch has no history and flags nothing. Scoring against
history-including-self converges to the batch operator as history
grows (test-pinned tolerance).

Crash safety as everywhere in this package: partials commit through
`sinks.idempotent_batch_write` per-batch overwrite — replays rewrite,
never double-add (the failure an additive statistic cannot survive).
Flagged rows commit the same way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from flink_application_spark.streaming.sinks import (
    idempotent_batch_write,
    trigger_kwargs,
)


class StreamingAnomalyDetector:
    def __init__(
        self,
        state_dir: str,
        *,
        key_col: str,
        value_col: str,
        threshold: float = 3.0,
        min_history: int = 30,
    ) -> None:
        self.key_col = key_col
        self.value_col = value_col
        self.threshold = threshold
        self.min_history = min_history  # don't flag on flimsy stats
        self._moments_dir = os.path.join(state_dir, "moments")
        self._flags_dir = os.path.join(state_dir, "flags")

    def _has(self, path: str) -> bool:
        import glob

        return bool(glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True))

    def history(self, spark) -> DataFrame:
        """Merged per-key moments over all committed batches:
        (key, n, mean, std)."""
        if not self._has(self._moments_dir):
            return spark.createDataFrame(
                [], "key string, n bigint, mean double, std double"
            )
        merged = (
            spark.read.parquet(self._moments_dir)
            .groupBy("key")
            .agg(F.sum("n").alias("n"), F.sum("s1").alias("s1"), F.sum("s2").alias("s2"))
        )
        mean = F.col("s1") / F.col("n")
        var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
        return merged.select("key", "n", mean.alias("mean"), F.sqrt(var).alias("std"))

    def flags(self, spark) -> DataFrame:
        if not self._has(self._flags_dir):
            return spark.createDataFrame(
                [], "key string, value double, zscore double"
            )
        return spark.read.parquet(self._flags_dir).select("key", "value", "zscore")

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ev = batch_df.select(
            F.col(self.key_col).cast("string").alias("key"),
            F.col(self.value_col).cast("double").alias("value"),
        ).filter(F.col("value").isNotNull())

        # score against PRIOR history (moments of batches < N — the
        # store cannot yet contain batch N except on replay, where the
        # overwrite below makes the replayed flags identical anyway
        # only if we exclude this batch's own partial; read via the
        # _batch partition column to be exact)
        hist_raw = None
        if self._has(self._moments_dir):
            hist_raw = spark.read.parquet(self._moments_dir).filter(
                F.col("_batch") != batch_id
            )
        if hist_raw is not None:
            merged = hist_raw.groupBy("key").agg(
                F.sum("n").alias("n"), F.sum("s1").alias("s1"), F.sum("s2").alias("s2")
            )
            mean = F.col("s1") / F.col("n")
            var = F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
            hist = merged.select(
                "key", "n", mean.alias("mean"), F.sqrt(var).alias("std")
            )
            flagged = (
                ev.join(F.broadcast(hist), "key")
                .filter(
                    (F.col("n") >= self.min_history)
                    & (F.col("std") > 0)
                    & (F.abs(F.col("value") - F.col("mean")) / F.col("std")
                       >= self.threshold)
                )
                .select(
                    "key",
                    "value",
                    F.round(
                        F.abs(F.col("value") - F.col("mean")) / F.col("std"), 4
                    ).alias("zscore"),
                )
            )
        else:
            flagged = ev.limit(0).select(
                "key", "value", F.lit(0.0).alias("zscore")
            )

        partial = ev.groupBy("key").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s1"),
            F.sum(F.col("value") * F.col("value")).alias("s2"),
        )
        idempotent_batch_write(flagged, self._flags_dir, batch_id)
        idempotent_batch_write(partial, self._moments_dir, batch_id)

    def attach(
        self,
        stream_df: DataFrame,
        checkpoint: str,
        trigger: str | None = None,
        query_name: str = "anomaly_detector",
    ) -> StreamingQuery:
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .queryName(query_name)
            .trigger(**trigger_kwargs(trigger))
            .start()
        )
