"""Streaming kNN-graph maintenance — the `operators/graph_insert.py`
micro-batch fold wired to the snapshot-store discipline: each arriving
batch of vectors beam-searches the latest committed pre-batch graph,
back-links, re-prunes, and commits the updated adjacency as a full
snapshot (`graph/_batch=<id>`); the batch's vectors append to an
additive coordinate store (`vectors/_batch=<id>`). Because a wave's
members never see each other and later waves see every earlier one,
a stream of waves is IDENTICAL to the batch `graph_insert_waves` run
with the same wave split — pinned by tests/test_graph_insert.py.

Replay safety (the shared store contract): a replayed batch reads the
newest graph snapshot STRICTLY BEFORE itself and coordinate batches
strictly before itself, then overwrites exactly its own two dirs —
bit-identical output, no double-insert. Crash partials (no _SUCCESS)
are invisible to readers. Old graph snapshots are superseded wholesale
— vacuum with `sinks.vacuum_snapshots`, never `compact_batches`.

Scale: snapshots are ids-only n·k edge frames; vectors are written
once each (additive), and the per-batch work is bounded by the wave
size, not the corpus (module doc of operators/graph_insert.py).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_application_spark.operators.graph_insert import graph_insert_batch
from flink_application_spark.operators.kmeans_exact import quantize_ppm
from flink_application_spark.streaming.sinks import (
    committed_batch_dirs,
    idempotent_batch_write,
    trigger_kwargs,
)

_GRAPH_SCHEMA = "src bigint, dst bigint, d2 bigint, rank int"
_COORD_SCHEMA = "vec_id bigint, e array<bigint>"


class GraphIngest:
    """Grows a seeded kNN graph as vector micro-batches arrive.

    ``seed(spark, base_graph, base_coords)`` must run once before any
    batch: it writes the base adjacency (vec_id/nbr_id or src/dst
    columns, with d2 + rank) and base ppm coordinates under
    ``base/``. Entry points are the ``beam`` smallest BASE vec_ids,
    frozen at seed time (the wave-invariant convention shared with
    the batch operator and the oracle)."""

    def __init__(
        self, store_dir: str, *, k: int = 6, beam: int = 8, hops: int = 2
    ) -> None:
        self.store_dir = store_dir
        self.k, self.beam, self.hops = k, beam, hops
        self._graph_dir = os.path.join(store_dir, "graph")
        self._vec_dir = os.path.join(store_dir, "vectors")
        self._base_graph = os.path.join(store_dir, "base", "graph")
        self._base_coords = os.path.join(store_dir, "base", "coords")
        self._entries: list[int] | None = None

    # -- seeding -------------------------------------------------------

    def seed(
        self, spark: SparkSession, base_graph: DataFrame, base_coords: DataFrame
    ) -> None:
        cols = set(base_graph.columns)
        if "vec_id" in cols and "src" not in cols:
            base_graph = base_graph.select(
                F.col("vec_id").alias("src"),
                F.col("nbr_id").alias("dst"),
                "d2",
                "rank",
            )
        base_graph.write.mode("overwrite").parquet(self._base_graph)
        base_coords.select("vec_id", "e").write.mode("overwrite").parquet(
            self._base_coords
        )

    def seed_from_embeddings(
        self, spark: SparkSession, base_emb: DataFrame, *, graph_iters: int = 3
    ) -> None:
        """Convenience: NN-Descent-build the base graph from raw
        (vec_id, embedding) rows and seed the store with it."""
        from flink_application_spark.operators.nndescent_exact import (
            nn_descent_exact,
        )

        base_emb = base_emb.filter(F.col("embedding").isNotNull())
        self.seed(
            spark,
            nn_descent_exact(base_emb, k=self.k, n_iter=graph_iters),
            quantize_ppm(base_emb),
        )

    # -- store access ---------------------------------------------------

    def _latest_graph_dir(self, before: int | None = None) -> str | None:
        best_id, best = -1, None
        for d in committed_batch_dirs(self._graph_dir):
            m = re.search(r"_batch=(\d+)$", d)
            if not m:
                continue
            bid = int(m.group(1))
            if (before is None or bid < before) and bid > best_id:
                best_id, best = bid, d
        return best

    def graph(self, spark: SparkSession, before: int | None = None) -> DataFrame:
        d = self._latest_graph_dir(before)
        if d is not None:
            return (
                spark.read.option("basePath", self._graph_dir)
                .parquet(d)
                .select("src", "dst", "d2", "rank")
            )
        return spark.read.parquet(self._base_graph)

    def _coords(self, spark: SparkSession, before: int | None = None) -> DataFrame:
        out = spark.read.parquet(self._base_coords)
        dirs = [
            d
            for d in committed_batch_dirs(self._vec_dir)
            if before is None
            or int(re.search(r"_batch=(\d+)$", d).group(1)) < before
        ]
        if dirs:
            out = out.unionByName(
                spark.read.option("basePath", self._vec_dir)
                .parquet(*dirs)
                .select("vec_id", "e")
            )
        return out

    def _entry_ids(self, spark: SparkSession) -> list[int]:
        if self._entries is None:
            self._entries = [
                r["vec_id"]
                for r in spark.read.parquet(self._base_coords)
                .orderBy("vec_id")
                .limit(self.beam)
                .collect()
            ]
        return self._entries

    # -- per-batch maintenance -------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        new = quantize_ppm(
            batch_df.filter(F.col("embedding").isNotNull())
        ).localCheckpoint(eager=True)
        if new.limit(1).count() == 0:
            # still commit the (empty) vector batch so replay stays a
            # strict overwrite; graph snapshot unchanged → skip
            idempotent_batch_write(
                spark.createDataFrame([], _COORD_SCHEMA), self._vec_dir, batch_id
            )
            return
        graph_cur = self.graph(spark, before=batch_id)
        coords_cur = self._coords(spark, before=batch_id)
        updated, _ = graph_insert_batch(
            graph_cur,
            coords_cur,
            new,
            k=self.k,
            beam=self.beam,
            hops=self.hops,
            entry_ids=self._entry_ids(spark),
        )
        idempotent_batch_write(updated, self._graph_dir, batch_id)
        idempotent_batch_write(new, self._vec_dir, batch_id)

    def attach(self, vec_stream: DataFrame, checkpoint: str, trigger=None):
        return (
            vec_stream.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**trigger_kwargs(trigger))
            .start()
        )
