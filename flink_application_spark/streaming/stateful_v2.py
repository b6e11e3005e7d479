"""Custom stateful streaming operators on the transformWithState API.

`stateful.py` implements the reference's keyed-accumulator contract
(MaxStartTimeAggregate, EnrichmentApp.java:376-403) with
`applyInPandasWithState` — Spark's original arbitrary-state surface.
This module is the same operator on the **transformWithStateInPandas**
API (Spark 4.x): typed composite state (`ValueState`), an explicit
processor lifecycle (`init`/`handleInputRows`/`close`), timers, and
TTL — the closest Spark analogue to Flink's `KeyedProcessFunction` +
`ValueState`, and the forward-looking home for custom operators the
built-in session-window/`max_by` path can't express.

Scale notes: identical to the v1 operator — state is per-key in the
state store (RocksDB provider on a cluster), partitioned by the group
key's hash exchange; emission is append-per-improvement in update
mode; nothing is collected to the driver.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame


def transform_with_state_available() -> bool:
    """transformWithStateInPandas drives a state-server protocol over
    protobuf; gate callers (and tests) on the dependency actually
    importing — the PySpark API surface exists even when the runtime
    dependency is absent."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import StructType


class ArgmaxDedupProcessor(StatefulProcessor):
    """Keep the best row per key across all micro-batches; emit on
    improvement. Ordering contract matches `operators.dedup.argmax_dedup`
    and `stateful.stateful_argmax_dedup`: tuple-lexicographic over
    `order_cols`, nulls lowest."""

    def __init__(self, payload_schema: StructType, order_cols: list[str]):
        self._schema = payload_schema
        self._names = [f.name for f in payload_schema]
        self._order_cols = order_cols

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._best = handle.getValueState("best", self._schema)

    def _order_key(self, row: dict):
        import pandas as pd

        out = []
        for c in self._order_cols:
            v = row[c]
            null = v is None or (isinstance(v, float) and v != v) or v is pd.NaT
            out.append((not null, None if null else v))
        return tuple(out)

    def handleInputRows(self, key, rows, timer_values) -> Iterator:
        import pandas as pd

        best = (
            dict(zip(self._names, self._best.get())) if self._best.exists() else None
        )
        improved = False
        for pdf in rows:
            for _, prow in pdf.iterrows():
                cand = prow.to_dict()
                if best is None or self._order_key(cand) > self._order_key(best):
                    best = cand
                    improved = True
        if best is not None:
            self._best.update(tuple(best[c] for c in self._names))
        if improved:
            yield pd.DataFrame([best], columns=self._names)

    def close(self) -> None:
        pass


def stateful_argmax_dedup_v2(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Running per-key arg-max via transformWithStateInPandas —
    semantically identical to `stateful.stateful_argmax_dedup`; the max
    emission per key equals the batch arg-max over the whole input."""
    return df.groupBy(*key_cols).transformWithStateInPandas(
        ArgmaxDedupProcessor(df.schema, order_cols),
        outputStructType=df.schema,
        outputMode="Update",
        timeMode="None",
    )
