"""Deterministic mergeable HyperLogLog — the oracle-replayable sketch.

`plans/sketch_queries.py` ships the DataSketches HLL
(`hll_sketch_agg`), whose register layout is engine-internal — its
estimates can never hash-match a DuckDB replay, so that query is
rows-only by necessity. This module is the same 100 TB cardinality
shape (build tiny mergeable state per partition slice, re-aggregate by
merge instead of re-scanning raw data) built from PORTABLE primitives,
extending the round-6/7 determinism recipe (seeded IVF, integer MMR)
to sketches:

- hash = md5 of the value's canonical string (identical across Spark,
  DuckDB, and Python's hashlib);
- register = the first 3 hex chars (p = 12 bits, m = 4096 registers);
- rank = 1 + leading zero BITS of the next 13 hex chars (52 bits),
  computed by exact string surgery (count leading '0' hex chars ×4,
  plus a CASE on the first non-zero hex digit) — no float log2, no
  engine-specific bit intrinsics — capped at 32 (a rank ≥ 32 occurs
  w.p. 2⁻³², and the cap keeps the harmonic sum an exact BIGINT:
  Σ 2^(32−rank) ≤ m·2³¹ ≪ 2⁶³);
- mergeable state = LONG-FORMAT rows (group…, register, rank) with
  max(rank) per register — merge IS groupBy-max, associative /
  commutative / idempotent, so daily sketches roll up to any
  dimension subset exactly like the DataSketches table (and the
  driver-facing schema stays free of complex types);
- estimate = α·m²·2³² / S with S the EXACT integer
  Σ_observed 2^(32−rank) + (m−observed)·2³², the numerator one
  Python-precomputed double literal inlined VERBATIM into both
  engines (single IEEE division → identical bits), plus the standard
  small-range linear-counting correction m·ln(m/V) for
  E ≤ 2.5m, V > 0 (Flajolet et al., AMS 2007).

Accuracy: standard HLL rsd ≈ 1.04/√m ≈ 1.6 % at m = 4096 — pinned
against exact distinct counts in tests/test_det_hll.py, along with
merge == direct table equality and a pure-Python register/rank parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

M = 4096  # 2^12 registers (p = 12 bits = 3 hex chars)
RANK_CAP = 32
_TWO32 = 4294967296  # 2^32, the empty-register term in the scaled sum
# α_m·m²·2³² precomputed ONCE in Python and inlined verbatim into both
# engines (see det_hll_numerator) — a single double literal divided by
# the exact integer S gives bit-identical estimates everywhere.
ALPHA_NUM = 0.7213 / (1 + 1.079 / M) * M * M * float(_TWO32)


def det_hll_numerator() -> str:
    """The α·m²·2³² double literal, full precision — use THIS string in
    oracle SQL (CAST(<repr> AS DOUBLE)) so both engines divide the same
    constant."""
    return repr(ALPHA_NUM)


def register_and_rank(value: Column) -> tuple[Column, Column]:
    """(register, rank) of one value — exact integer/string arithmetic
    only, replayable in any engine with md5 + substring + regexp."""
    h = F.md5(value.cast("string"))
    register = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    rest = F.substring(h, 4, 13)  # 52 bits
    strip = F.regexp_replace(rest, "^0+", "")
    z = F.lit(13) - F.length(strip)  # leading zero hex chars
    first = F.substring(strip, 1, 1)
    lz4 = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    rank = F.when(F.length(strip) == 0, F.lit(4 * 13 + 1)).otherwise(
        z * 4 + lz4 + 1
    )
    return register, F.least(rank, F.lit(RANK_CAP)).cast("int")


def det_hll_sketch(
    df: DataFrame, value_col: str, group_cols: list[str]
) -> DataFrame:
    """The mergeable sketch rows: (group…, register, rank) with
    max(rank) per register. Merging sketches = unionByName +
    groupBy(group…, register).max(rank) — `merge_sketches`."""
    register, rank = register_and_rank(F.col(value_col))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, register.alias("register"), rank.alias("rank"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rank").alias("rank"))
    )


def merge_sketches(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Re-aggregate sketch rows to a coarser grouping (e.g. drop the
    day dimension) — max is associative/commutative/idempotent, so any
    merge order, split, or replay gives the identical table."""
    return sketch.groupBy(*group_cols, "register").agg(
        F.max("rank").alias("rank")
    )


def det_hll_estimate(sketch: DataFrame, group_cols: list[str]) -> DataFrame:
    """Estimate per group from sketch rows: (group…, est_users rounded
    to 4, n_registers). Bit-reproducible across engines — see module
    docstring."""
    agg = sketch.groupBy(*group_cols).agg(
        F.sum(F.expr(f"CAST(pow(2D, {RANK_CAP} - rank) AS BIGINT)")).alias(
            "_sobs"
        ),
        F.count(F.lit(1)).alias("n_registers"),
    )
    s = (
        F.col("_sobs")
        + (F.lit(M) - F.col("n_registers")).cast("bigint") * F.lit(_TWO32)
    ).cast("double")
    v = F.lit(M) - F.col("n_registers")  # empty registers
    e_raw = F.lit(ALPHA_NUM) / s
    e_lin = F.lit(float(M)) * F.log(F.lit(float(M)) / v.cast("double"))
    est = F.when((e_raw <= F.lit(2.5 * M)) & (v > 0), e_lin).otherwise(e_raw)
    return agg.select(
        *group_cols,
        F.round(est, 4).alias("est_users"),
        F.col("n_registers").cast("bigint").alias("n_registers"),
    )
