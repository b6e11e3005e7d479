"""Sequence packing: the concat-then-chunk training-data layout.

LLM pretraining consumes fixed-length token sequences (e.g. 2048/4096/
8192); the standard preparation (GPT-2/3 lineage, "concat and chunk")
concatenates documents in a deterministic order and cuts the stream
into `seq_len` windows, tracking which document spans land in which
window so attention masking / boundary statistics stay computable.
This module plans that layout as pure table algebra — no tokenizer in
the loop (the plan consumes per-document token COUNTS; the counts can
come from the whitespace counter, the BPE applier, or an external
tokenizer's output column).

The whole computation is: one exclusive prefix sum over the document
order, then a per-row explode over the (first_bin..last_bin) range.
Everything downstream of the offsets is scan-local arithmetic.

Scale note — the prefix sum is THE serial hazard: a naive
`sum() OVER (ORDER BY id)` window collapses to a single task. The
`two_phase=True` path (default) computes it the distributed way:
per-partition subtotals (tiny driver collect, one row per partition)
are broadcast back as partition base offsets and the window runs
PER-PARTITION — the same output bit-for-bit (prefix sums are
partitioning-independent), with no global-order exchange. This is the
standard two-phase scan; at 100 TB the collect is #partitions rows.

Reference scope: the reference app has no training-prep surface; this
is part of the mandated beyond-reference LLM-pipeline layer (SURVEY
§M5), composing with doc_epoch_shuffle_shards (which orders docs) and
corpus_token_budget_planner (which picks them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_application_spark.operators.twophase import (
    partition_bases,
    ranged_with_pid,
    with_base_offsets,
)

__all__ = ["packed_spans", "packing_stats"]


def _with_offsets_two_phase(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    *,
    n_partitions: int | None = None,
    literal_max: int | None = None,
) -> DataFrame:
    """Add `_off` = exclusive prefix sum of `tokens_col` in ascending
    `id_col` order, without a global-order window: range-partition by
    id (PINNED — see operators/twophase.ranged_with_pid for why the
    frame must be materialized before the subtotals collect),
    per-partition local prefix sums, plus per-partition base offsets
    (collect = one row per partition; literal map or broadcast join by
    partition count)."""
    n_part = n_partitions or max(
        docs.sparkSession.sparkContext.defaultParallelism, 1
    )
    parted = ranged_with_pid(docs, n_part, [F.col(id_col)])
    base, _total = partition_bases(parted, F.sum(tokens_col))
    withb = with_base_offsets(parted, base, "_pk_base", literal_max)
    w = (
        Window.partitionBy("_pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.coalesce(F.sum(tokens_col).over(w), F.lit(0))
    return withb.withColumn(
        "_off", (F.col("_pk_base") + local).cast("bigint")
    ).drop("_pid", "_pk_base")


def packed_spans(
    docs: DataFrame,
    seq_len: int,
    *,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    two_phase: bool = True,
    base_offset: int = 0,
) -> DataFrame:
    """Plan the concat-then-chunk packing of `docs` (one row per doc
    with a token count) into fixed `seq_len` bins. Documents
    concatenate in ascending `id_col` order; zero-token documents are
    dropped (they occupy no span). Returns one row per (document ×
    bin) span:

    - ``bin_id``      — which training sequence the span lands in;
    - ``doc_id``      — the source document;
    - ``doc_offset``  — the span's start within the document (tokens);
    - ``bin_offset``  — the span's start within the bin;
    - ``span_len``    — span length in tokens.

    Invariants (pinned in tests/test_packing.py): per-document spans
    concatenate to the document; per-bin spans tile [0, seq_len)
    without gap or overlap (the last bin may be short); output is
    independent of input partitioning; ``two_phase`` True/False are
    bit-identical.

    ``base_offset`` starts the concatenation at a global token offset
    > 0 — the continuation hook the STREAMING packer uses to carry the
    cursor across micro-batches (packing waves [A; B] equals packing A
    then packing B at base_offset = tokens(A); associativity pinned in
    tests/test_packing.py)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    if base_offset < 0:
        raise ValueError(f"base_offset must be >= 0, got {base_offset}")
    docs = docs.select(id_col, tokens_col).filter(F.col(tokens_col) > 0)
    if two_phase:
        with_off = _with_offsets_two_phase(docs, id_col, tokens_col)
    else:
        w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, -1)
        with_off = docs.withColumn(
            "_off", F.coalesce(F.sum(tokens_col).over(w), F.lit(0)).cast("bigint")
        )
    if base_offset:
        with_off = with_off.withColumn(
            "_off", F.col("_off") + F.lit(base_offset).cast("bigint")
        )
    L = F.lit(seq_len).cast("bigint")
    # integer div (not float floor): offsets are exact BIGINTs and must
    # stay exact past 2^53 tokens
    first_bin = F.expr(f"_off div {seq_len}")
    last_bin = F.expr(f"(_off + {tokens_col} - 1) div {seq_len}")
    spans = with_off.select(
        F.col(id_col),
        F.col(tokens_col),
        "_off",
        F.explode(F.sequence(first_bin, last_bin)).alias("bin_id"),
    )
    bin_start = F.col("bin_id") * L  # global offset where this bin begins
    span_start = F.greatest(F.col("_off"), bin_start)
    span_end = F.least(F.col("_off") + F.col(tokens_col), bin_start + L)
    return spans.select(
        "bin_id",
        id_col,
        (span_start - F.col("_off")).alias("doc_offset"),
        (span_start - bin_start).alias("bin_offset"),
        (span_end - span_start).alias("span_len"),
    )


def packing_stats(spans: DataFrame, seq_len: int) -> DataFrame:
    """One-row packing report over a `packed_spans` output: bin count,
    total tokens, fill ratio (ppm — the last bin's slack is the only
    waste in concat-then-chunk), and how many documents cross a bin
    boundary (the fraction a boundary-respecting packer would try to
    shrink, at the cost of padding)."""
    per_doc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"), F.sum("span_len").alias("n_tokens")
    )
    return (
        spans.agg(
            (F.max("bin_id") + 1).alias("n_bins"),
            F.sum("span_len").alias("total_tokens"),
        )
        .crossJoin(
            per_doc.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum(F.when(F.col("n_spans") > 1, 1).otherwise(0)).alias(
                    "docs_crossing"
                ),
            )
        )
        .select(
            "n_bins",
            "n_docs",
            F.col("total_tokens").cast("bigint").alias("total_tokens"),
            F.col("docs_crossing").cast("bigint").alias("docs_crossing"),
            # integer div on both engines (Spark `div` ↔ DuckDB `//`):
            # float rounding must not flip a ppm at the boundary
            F.expr(f"(total_tokens * 1000000L) div (n_bins * {seq_len})").alias(
                "fill_ppm"
            ),
            F.expr("(docs_crossing * 1000000L) div n_docs").alias("crossing_ppm"),
        )
    )
