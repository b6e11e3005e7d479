"""Custom stateful streaming operators (applyInPandasWithState).

`session_argmax_dedup` (streaming/dedup.py) covers the reference's
windowed dedup with built-in session windows. This module is the
*generic keyed-state* surface — the Spark analogue of Flink's
`KeyedProcessFunction` + `ValueState` that the reference's
MaxStartTimeAggregate UDAF (EnrichmentApp.java:376-403) runs on:
arbitrary per-key state, explicit update logic, update-mode emission.

`stateful_argmax_dedup` keeps the best row per key across ALL
micro-batches (no window — true running state) and emits the new best
whenever it improves: exactly the accumulator contract of the
reference UDAF's add/merge (:384-402), with the same declared
tie-break ordering as the batch `argmax_dedup`.

Scale notes: state lives in the state store (RocksDB-backed on a real
cluster), partitioned by the group key — the same hash exchange the
batch window uses. Emission is append-per-improvement; downstream
consumers take the latest emission per key (or feed a compacted sink).
State is never collected to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def stateful_argmax_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
) -> DataFrame:
    """Running per-key arg-max with explicit keyed state.

    Works only on streaming DataFrames (batch callers should use
    `operators.dedup.argmax_dedup`). Emits a row for a key whenever its
    best-so-far improves; the max emission per key equals the batch
    arg-max over the whole input (emissions improve monotonically).
    """
    payload_schema: StructType = df.schema
    out_names = [f.name for f in payload_schema]

    def update(key, pdf_iter, state: GroupState):
        import pandas as pd

        def order_key(row: dict):
            # nulls (None/NaN/NaT) sort lowest — matches the batch
            # form's desc_nulls_last preference for non-null values;
            # tuples compare lexicographically
            out = []
            for c in order_cols:
                v = row[c]
                null = v is None or (isinstance(v, float) and v != v) or v is pd.NaT
                out.append((not null, None if null else v))
            return tuple(out)

        best = dict(zip(out_names, state.get)) if state.exists else None
        improved = False
        for pdf in pdf_iter:
            for _, prow in pdf.iterrows():
                cand = prow.to_dict()
                if best is None or order_key(cand) > order_key(best):
                    best = cand
                    improved = True
        if best is not None:
            state.update(tuple(best[c] for c in out_names))
        if improved:
            yield pd.DataFrame([best], columns=out_names)

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=payload_schema,
        stateStructType=payload_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
