"""Row-level dedup / arg-max reduction operators.

`argmax_dedup` is the batch form of the reference's keyed session-window
max-by aggregate (EnrichmentApp.java:142-156 + the MaxStartTimeAggregate
UDAF at :376-403): per key keep exactly the row with the greatest
ordering column. The streaming form lives in `streaming.dedup`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def argmax_dedup(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list,
) -> DataFrame:
    """Keep one row per key: the max under `order_cols` (descending,
    first column is the primary criterion; pass extra columns as a
    deterministic tie-break — the reference UDAF keeps whichever row
    arrived last on ties, which is nondeterministic; we declare the
    tie-break instead, per SURVEY §5).

    Implemented as window row_number rather than
    `groupBy().agg(max_by(struct(*)))` — both are single-shuffle on the
    key; row_number preserves input column order/types exactly and AQE
    handles key skew. At 100 TB this is one hash exchange on key_cols;
    no driver-side work.
    """
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).desc_nulls_last() for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, on_cols: list[str], keep_min: str) -> DataFrame:
    """Exact duplicate removal: group identical `on_cols` values, keep
    the row with the smallest `keep_min` (deterministic canonical
    representative).

    Scale note: single shuffle on a hash of the dedup columns. For wide
    text columns pre-hash (`F.xxhash64`) so the shuffle key is 8 bytes,
    not the document body.
    """
    w = Window.partitionBy(*on_cols).orderBy(F.col(keep_min).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
