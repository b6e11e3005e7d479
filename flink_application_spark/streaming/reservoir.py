"""Streaming uniform sample via deterministic bottom-k — the
reservoir-sampling operator re-expressed so stream == batch exactly.

Classic reservoir sampling keeps a uniform k-sample of a stream with
RNG state per insertion — order-dependent, unreplayable, and wrong
under Spark's micro-batch retries. The deterministic form keeps the k
rows with the SMALLEST md5-derived rank (a bottom-k sketch): md5 is a
fixed uniform permutation of the key space, so "k smallest ranks" IS a
uniform k-sample, and min-k is associative — any batch split, any
arrival order, any replay converges to the same sample as one pass
over the full corpus (pinned by tests/test_reservoir.py). The same
md5-rank discipline as the batch samplers (`doc_weighted_sample`'s
Efraimidis–Spirakis keys, `doc_systematic_sample`'s bucket filter).

Per micro-batch: rank the batch, union the previous sample (≤ k rows),
keep the k smallest, write to `sample/_batch=<id>/`. The union input
is ≤ k + |batch| rows, so per-batch cost is one small top-k — state is
HARD-bounded at k rows forever, the sampling counterpart of the Bloom
filter's m bits. Reads take the latest batch STRICTLY BEFORE the
current id, so a crash-replayed batch recomputes from the same
predecessor state and overwrites its own directory (idempotent).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


class BottomKSample:
    def __init__(self, store_dir: str, *, k: int = 100, id_col: str = "doc_id") -> None:
        self.k = k
        self.id_col = id_col
        self._dir = os.path.join(store_dir, "sample")

    # -- store access -------------------------------------------------

    def _batches(self) -> list[int]:
        # _SUCCESS-gated listing shared with every per-batch store
        # (sinks.committed_batch_dirs holds the crash-window rationale)
        from flink_application_spark.streaming.sinks import committed_batch_dirs

        return sorted(
            int(os.path.basename(p).split("=", 1)[1])
            for p in committed_batch_dirs(self._dir)
        )

    def _latest_before(self, spark, batch_id: int) -> DataFrame | None:
        prior = [b for b in self._batches() if b < batch_id]
        if not prior:
            return None
        return spark.read.parquet(os.path.join(self._dir, f"_batch={max(prior)}"))

    def sample(self, spark) -> DataFrame:
        """The current k-sample (payload columns + rkey)."""
        done = self._batches()
        if not done:
            raise ValueError("no completed batches in the sample store")
        return spark.read.parquet(os.path.join(self._dir, f"_batch={max(done)}"))

    # -- per-batch maintenance ----------------------------------------

    def rank(self, df: DataFrame) -> DataFrame:
        """Attach the deterministic md5 rank (idempotent on re-rank)."""
        if "rkey" in df.columns:
            return df
        return df.withColumn(
            "rkey", F.md5(F.concat(F.lit("rs:"), F.col(self.id_col).cast("string")))
        )

    def bottom_k(self, df: DataFrame) -> DataFrame:
        return self.rank(df).orderBy("rkey", self.id_col).limit(self.k)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        cur = self.rank(batch_df)
        prev = self._latest_before(spark, batch_id)
        if prev is not None:
            cur = cur.unionByName(prev)
        # a replayed batch overwrites its own directory from the same
        # strictly-earlier predecessor — same output, no duplication
        self.bottom_k(cur).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self._dir, f"_batch={batch_id}")
        )

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )
