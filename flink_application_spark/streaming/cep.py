"""Streaming CEP: the `operators/cep.py` automaton on live keyed
streams — Flink CEP's actual operating mode, on
`applyInPandasWithState`.

Event-time correctness under out-of-order arrival: a match decision is
only final once no earlier event can still arrive, so events buffer in
keyed state until the watermark passes them, and ONLY the matured
prefix (ts ≤ watermark) runs through the automaton. The un-matured
tail and any open partial match carry over in state. Because batch and
streaming run the SAME `greedy_scan` core over the same
watermark-ordered event sequence, the union of streamed emissions
equals the batch operator's output on the same data — pinned by
`tests/test_streaming_cep.py`.

State per key, all bounded:
- buffered events (ts µs, id, step-flag bitmask — one long per event,
  so k ≤ 63 steps): the un-matured tail plus, when a partial match is
  open, the matured suffix from its first binding (the head-expiry
  rewind can re-visit those; `within` bounds how long that suffix can
  grow, and without `within` no rewind ever happens so only the
  un-matured tail is retained);
- the open partial match (≤ k indices) and the scan frontier.

Late events (ts ≤ the frontier already scanned) are dropped — the
watermark contract, same as every other stateful operator here; Spark
additionally filters rows later than the watermark before the operator
sees them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampNTZType,
)

from flink_application_spark.operators.cep import greedy_scan, greedy_scan_quant


def stateful_match_pattern(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    steps: list[Column],
    within_seconds: float | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Streaming twin of `operators.cep.match_pattern` (same args,
    same output schema; `df` must be a watermarked streaming frame)."""
    k = len(steps)
    if k == 0:
        raise ValueError("stateful_match_pattern: need at least one step")
    if k > 63:
        raise ValueError("step flags are bitmask-encoded: k must be <= 63")
    within_us = None if within_seconds is None else int(within_seconds * 1_000_000)

    mask = F.lit(0).cast("bigint")
    for i, s in enumerate(steps):
        mask = mask + F.when(s.cast("boolean"), F.lit(1 << i)).otherwise(F.lit(0)).cast(
            "bigint"
        )
    if id_col is None:
        # monotonically_increasing_id restarts per micro-batch: buffered
        # and new events could collide and replays would re-emit under
        # different ids — a streaming pattern needs a durable event id
        raise ValueError("stateful_match_pattern requires id_col (stable event ids)")
    flags = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("_key"),
        # stays TIMESTAMP: a cast to ntz would strip the event-time
        # watermark tag applyInPandasWithState requires
        F.col(ts_col).alias("_ts"),
        # epoch µs computed JVM-side: getCurrentWatermarkMs is UTC
        # epoch, and pandas would otherwise hand us session-LOCAL wall
        # clocks — comparing those matures events wrongly off-UTC
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
        F.col(id_col).cast("bigint").alias("_id"),
        mask.alias("_mask"),
    )

    out_fields = [StructField("key", flags.schema["_key"].dataType)]
    for i in range(k):
        out_fields.append(StructField(f"step_{i + 1}_ts", TimestampNTZType()))
    for i in range(k):
        out_fields.append(StructField(f"step_{i + 1}_id", LongType()))
    out_schema = StructType(out_fields)

    state_schema = StructType(
        [
            StructField("ts", ArrayType(LongType())),
            StructField("ids", ArrayType(LongType())),
            StructField("masks", ArrayType(LongType())),
            StructField("bound", ArrayType(IntegerType())),
            StructField("scanned", LongType()),
            StructField("frontier", LongType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            ts_buf, id_buf, mask_buf, bound, scanned, frontier = state.get
            ts_buf, id_buf, mask_buf = list(ts_buf), list(id_buf), list(mask_buf)
            bound = list(bound)
            scanned = int(scanned)
            frontier = int(frontier)
        else:
            ts_buf, id_buf, mask_buf, bound, scanned, frontier = [], [], [], [], 0, -(2**62)

        new = []
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            for tu, i_, m_ in zip(
                pdf["_ts_us"].tolist(), pdf["_id"].tolist(), pdf["_mask"].tolist()
            ):
                if tu > frontier:  # frontier-late events are dropped
                    new.append((int(tu), int(i_), int(m_)))
        if new:
            # the buffer's scanned prefix is all ≤ frontier < every new
            # event, so sorting the unscanned suffix + new keeps global
            # (ts, id) order
            tail = list(zip(ts_buf[scanned:], id_buf[scanned:], mask_buf[scanned:]))
            tail.extend(new)
            tail.sort()
            ts_buf = ts_buf[:scanned] + [x[0] for x in tail]
            id_buf = id_buf[:scanned] + [x[1] for x in tail]
            mask_buf = mask_buf[:scanned] + [x[2] for x in tail]

        # mature prefix: order is final once the watermark passed it
        n_mature = 0
        for tu in ts_buf:
            if tu <= wm_us:
                n_mature += 1
            else:
                break
        flags_cols = [[(m >> i) & 1 == 1 for m in mask_buf] for i in range(k)]
        matches, bound, scanned = greedy_scan(
            ts_buf, flags_cols, k, within_us, bound, scanned, n_mature
        )

        rows = []
        for m in matches:
            row = {"key": key[0]}
            for j, pos in enumerate(m):
                row[f"step_{j + 1}_ts"] = pd.Timestamp(ts_buf[pos], unit="us")
                row[f"step_{j + 1}_id"] = id_buf[pos]
            rows.append(row)

        # rebase. With `within` set, the head-expiry rewind can revisit
        # mature events after the partial's head, so retain from
        # bound[0] — state is then bounded by the horizon. Without
        # `within` no rewind ever happens: the bound events are needed
        # only for emission/continuation, so compact them to a
        # synthetic ≤(k−1)-row prefix and drop every other scanned
        # event — state is then (k−1) + un-matured tail, O(1) per key.
        if bound and within_us is None:
            ts_buf = [ts_buf[b] for b in bound] + ts_buf[scanned:]
            id_buf = [id_buf[b] for b in bound] + id_buf[scanned:]
            mask_buf = [mask_buf[b] for b in bound] + mask_buf[scanned:]
            bound = list(range(len(bound)))
            scanned = len(bound)
        else:
            keep_from = bound[0] if bound else scanned
            ts_buf = ts_buf[keep_from:]
            id_buf = id_buf[keep_from:]
            mask_buf = mask_buf[keep_from:]
            bound = [b - keep_from for b in bound]
            scanned -= keep_from
        state.update((ts_buf, id_buf, mask_buf, bound, scanned, max(frontier, wm_us)))

        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return flags.groupBy("_key").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_match_pattern_quant(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    steps: list[Column],
    quantifiers: list[str],
    within_seconds: float | None = None,
    id_col: str | None = None,
    not_between: list[Column | None] | None = None,
) -> DataFrame:
    """Streaming twin of the QUANTIFIED batch operator
    (`operators.cep.match_pattern` with quantifiers/not_between):
    Kleene-plus steps and notFollowedBy guards on live keyed streams.

    Same watermark-maturity harness as `stateful_match_pattern`; the
    carried partial is the quantified core's list-of-position-lists
    (flattened + per-step counts in state). Retention is always from
    the open partial's head: BOTH the within-horizon rewind and a
    guard kill re-seek there, so the O(1) bound-compaction the plain
    operator applies without `within` is only valid here when neither
    rewind source exists (no within AND no guards).

    Step and guard predicates share one ≤63-bit mask: bits [0, k) are
    steps, bits [k, 2k-1) the k-1 gap guards.
    """
    k = len(steps)
    if k == 0:
        raise ValueError("stateful_match_pattern_quant: need at least one step")
    if len(quantifiers) != k:
        raise ValueError("quantifiers must match steps length")
    if any(q not in ("once", "oneOrMore") for q in quantifiers):
        raise ValueError("quantifiers are 'once' or 'oneOrMore'")
    if quantifiers[-1] == "oneOrMore":
        raise ValueError("the final step must be 'once' (no stop signal)")
    if not_between is not None and len(not_between) != k - 1:
        raise ValueError("not_between must have one entry per step gap (k-1)")
    n_guard_bits = k - 1 if not_between is not None else 0
    if k + n_guard_bits > 63:
        raise ValueError("steps + guards exceed the 63-bit flag mask")
    if id_col is None:
        raise ValueError("stateful_match_pattern_quant requires id_col")
    within_us = None if within_seconds is None else int(within_seconds * 1_000_000)
    has_guards = not_between is not None
    quants = list(quantifiers)

    mask = F.lit(0).cast("bigint")
    for i, s in enumerate(steps):
        mask = mask + F.when(s.cast("boolean"), F.lit(1 << i)).otherwise(
            F.lit(0)
        ).cast("bigint")
    if has_guards:
        for j, g in enumerate(not_between):
            if g is None:
                continue
            mask = mask + F.when(g.cast("boolean"), F.lit(1 << (k + j))).otherwise(
                F.lit(0)
            ).cast("bigint")

    flags = df.filter(F.col(ts_col).isNotNull()).select(
        F.col(key_col).alias("_key"),
        F.col(ts_col).alias("_ts"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_ts_us"),
        F.col(id_col).cast("bigint").alias("_id"),
        mask.alias("_mask"),
    )

    out_fields = [StructField("key", flags.schema["_key"].dataType)]
    for i in range(k):
        out_fields.append(StructField(f"step_{i + 1}_ts", TimestampNTZType()))
    for i in range(k):
        out_fields.append(StructField(f"step_{i + 1}_id", LongType()))
    for i in range(k):
        out_fields.append(StructField(f"step_{i + 1}_n", LongType()))
    out_schema = StructType(out_fields)

    state_schema = StructType(
        [
            StructField("ts", ArrayType(LongType())),
            StructField("ids", ArrayType(LongType())),
            StructField("masks", ArrayType(LongType())),
            StructField("bound_flat", ArrayType(IntegerType())),
            StructField("bound_counts", ArrayType(IntegerType())),
            StructField("scanned", LongType()),
            StructField("frontier", LongType()),
        ]
    )

    def update(key, pdf_iter, state: GroupState):
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            (ts_buf, id_buf, mask_buf, bound_flat, bound_counts,
             scanned, frontier) = state.get
            ts_buf, id_buf, mask_buf = list(ts_buf), list(id_buf), list(mask_buf)
            bound, off = [], 0
            for c in bound_counts:
                bound.append([int(p) for p in bound_flat[off:off + c]])
                off += c
            scanned = int(scanned)
            frontier = int(frontier)
        else:
            ts_buf, id_buf, mask_buf = [], [], []
            bound, scanned, frontier = [], 0, -(2**62)

        new = []
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            for tu, i_, m_ in zip(
                pdf["_ts_us"].tolist(), pdf["_id"].tolist(), pdf["_mask"].tolist()
            ):
                if tu > frontier:
                    new.append((int(tu), int(i_), int(m_)))
        if new:
            tail = list(zip(ts_buf[scanned:], id_buf[scanned:], mask_buf[scanned:]))
            tail.extend(new)
            tail.sort()
            ts_buf = ts_buf[:scanned] + [x[0] for x in tail]
            id_buf = id_buf[:scanned] + [x[1] for x in tail]
            mask_buf = mask_buf[:scanned] + [x[2] for x in tail]

        n_mature = 0
        for tu in ts_buf:
            if tu <= wm_us:
                n_mature += 1
            else:
                break
        flags_cols = [[(m >> i) & 1 == 1 for m in mask_buf] for i in range(k)]
        guard_cols = None
        if has_guards:
            guard_cols = [
                [(m >> (k + j)) & 1 == 1 for m in mask_buf] for j in range(k - 1)
            ]
        matches, bound, scanned = greedy_scan_quant(
            ts_buf, flags_cols, quants, within_us, bound, scanned, n_mature,
            guards=guard_cols,
        )

        rows = []
        for m in matches:
            row = {"key": key[0]}
            for j, positions in enumerate(m):
                row[f"step_{j + 1}_ts"] = pd.Timestamp(ts_buf[positions[0]], unit="us")
                row[f"step_{j + 1}_id"] = id_buf[positions[0]]
                row[f"step_{j + 1}_n"] = len(positions)
            rows.append(row)

        if bound and within_us is None and not has_guards:
            # no rewind source: compact to the bound positions only
            flat = [p for b in bound for p in b]
            remap = {p: i for i, p in enumerate(flat)}
            ts_buf = [ts_buf[p] for p in flat] + ts_buf[scanned:]
            id_buf = [id_buf[p] for p in flat] + id_buf[scanned:]
            mask_buf = [mask_buf[p] for p in flat] + mask_buf[scanned:]
            bound = [[remap[p] for p in b] for b in bound]
            scanned = len(flat)
        else:
            keep_from = bound[0][0] if bound else scanned
            ts_buf = ts_buf[keep_from:]
            id_buf = id_buf[keep_from:]
            mask_buf = mask_buf[keep_from:]
            bound = [[p - keep_from for p in b] for b in bound]
            scanned -= keep_from
        state.update(
            (
                ts_buf,
                id_buf,
                mask_buf,
                [p for b in bound for p in b],
                [len(b) for b in bound],
                scanned,
                max(frontier, wm_us),
            )
        )

        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])

    return flags.groupBy("_key").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
