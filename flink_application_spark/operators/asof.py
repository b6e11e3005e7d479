"""Scalable as-of join.

The reference composes its as-of semantics from a theta join plus a
session-window max-by reduction (EnrichmentApp.java:320-340 + 142-156).
`theta_asof_candidates` + `argmax_dedup` reproduce that shape, but the
candidate set is |left| × |versions-per-key| before the reduction —
at 100 TB with low-cardinality equi keys (probe, ip) and deep version
history, the intermediate explodes (SURVEY §7.4 hard-part #3).

`asof_join` is the scale path: shuffle BOTH sides once on the equi
keys, then per key do a sort + backward merge (pandas.merge_asof) in
an Arrow-batched `applyInPandas` — O(n log n) per key, no candidate
blowup, and version history never leaves its partition. This is the
same algorithm Flink's temporal join runs internally (sorted state per
key) and what pandas/DuckDB expose as ASOF JOIN.

Skew note: a hot equi key still lands on one task; pre-split hot keys
with `operators.skew.salted` helpers if the key histogram is extreme.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StructType


def asof_join(
    left: DataFrame,
    right: DataFrame,
    equi_keys: list[tuple[str, str]],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "inner",
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the single right row with the greatest
    `right_ts` ≤ `left_ts` among rows matching the equi keys
    ("backward" as-of). `right_payload` columns are appended (renamed
    as given); unmatched left rows are kept for how='left', dropped
    for how='inner'.

    Tie/determinism contract: among right rows sharing the max ts for
    a key, the one with the greatest payload tuple wins (matches
    `argmax_dedup`'s declared ordering).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be inner|left, got {how!r}")

    lkeys = [lk for lk, _ in equi_keys]
    rkeys = [rk for _, rk in equi_keys]

    out_schema = StructType.fromDDL(
        ", ".join(
            [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema]
            + [
                f"`{c}` {right.schema[c].dataType.simpleString()}"
                for c in [right_ts, *right_payload]
            ]
        )
    )
    r_cols = [*rkeys, right_ts, *right_payload]
    l_cols = list(left.columns)
    # one struct column per side so the cogrouped frames can't collide
    l_tagged = left
    r_tagged = right.select(*r_cols)

    def merge(key, lpdf, rpdf):
        import pandas as pd
        if len(lpdf) == 0:
            return pd.DataFrame(columns=[f.name for f in out_schema])
        lpdf = lpdf.sort_values(left_ts, kind="mergesort")
        if len(rpdf) == 0:
            merged = lpdf.copy()
            merged[right_ts] = pd.NaT
            for c in right_payload:
                merged[c] = None
        else:
            # deterministic tie-break: greatest (ts, payload...) first,
            # merge_asof keeps the LAST right row ≤ left ts, so sort
            # ascending with payload as secondary keys
            rpdf = rpdf.sort_values(
                [right_ts, *right_payload], kind="mergesort"
            ).drop(columns=rkeys)
            merged = pd.merge_asof(
                lpdf,
                rpdf,
                left_on=left_ts,
                right_on=right_ts,
                direction="backward",
                tolerance=tolerance,
                suffixes=("", "__r"),
            )
            if right_ts in lpdf.columns:  # same ts name on both sides
                merged = merged.rename(columns={f"{right_ts}__r": right_ts})
        if how == "inner":
            merged = merged[merged[right_ts].notna()]
        return merged[[f.name for f in out_schema]]

    grouped = l_tagged.groupBy(*[F.col(k) for k in lkeys]).cogroup(
        r_tagged.groupBy(*[F.col(k) for k in rkeys])
    )
    out = grouped.applyInPandas(merge, schema=out_schema)
    # applyInPandas can't express "left join keys with no left rows";
    # cogroup already yields only keys present on either side, and
    # merge() returns empty for right-only keys — semantics complete.
    return out
