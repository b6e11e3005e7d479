"""Skew-mitigation operators: salting for hot keys.

AQE's skew-join handling (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) splits oversized *partitions* at runtime, but it cannot
split a single hot KEY in an aggregation, and it only applies to
sort-merge joins. These operators implement the classic salting
patterns for the cases AQE can't reach:

- `salted_aggregate`: two-stage aggregation — partial agg on
  (keys ++ salt), final combine on keys. A key receiving 1B rows
  becomes n_salts partial groups computed in parallel; the final
  stage combines n_salts rows per key. Only decomposable aggregates
  (sum/count/min/max and avg = sum/count) qualify — exactly the set
  with a map-side partial form.
- `replicate_small_side` + `with_salt`: shuffle-join salting — the
  skewed fact side gets a random salt in [0, n), the dimension side is
  replicated n× (one copy per salt), and the join key becomes
  (key, salt). Shuffle spread × n for the dim in exchange for the hot
  key fanning out over n tasks.

The salt is `pmod(hash(deterministic cols), n)` by default rather than
rand() so retried tasks produce identical output (rand() in a shuffle
map task breaks exactly-once on retry — the same reason the reference
seeds its generator from a recycled ResultSet rather than per-call
randomness, CsvData.java:92-96).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DecomposableAgg = tuple[str, str]  # (column, fn) with fn ∈ sum|count|min|max


def with_salt(
    df: DataFrame, n_salts: int, from_cols: list[str] | None = None
) -> DataFrame:
    """Add a `_salt` column in [0, n_salts). Deterministic: hashes
    `from_cols` (default: all columns) — task retries re-produce it."""
    cols = [F.col(c) for c in (from_cols or df.columns)]
    return df.withColumn("_salt", F.pmod(F.hash(*cols), F.lit(n_salts)))


def replicate_small_side(df: DataFrame, n_salts: int) -> DataFrame:
    """Cross the small side with salts 0..n-1 (explode, not a join —
    stays narrow)."""
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    return df.withColumn("_salt", F.explode(salts))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[tuple[str, str]],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated
    n_salts×. Use when the small side exceeds the broadcast threshold
    AND the big side's key histogram is skewed."""
    b = with_salt(big, n_salts)
    s = replicate_small_side(small, n_salts)
    cond = F.col("_salt") == F.col("_salt_r")
    s = s.withColumnRenamed("_salt", "_salt_r")
    for bk, sk in on:
        cond = cond & (b[bk] == s[sk])
    return b.join(s, cond, how).drop("_salt", "_salt_r")


_PARTIAL = {
    "sum": F.sum,
    "count": lambda c: F.count(F.lit(1)),
    "min": F.min,
    "max": F.max,
}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: list[DecomposableAgg],
    n_salts: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Two-stage skew-proof aggregation. Output column for (col, fn) is
    `{fn}_{col}` (count uses `count_star` when col is '*').

    Equivalent to df.groupBy(keys).agg(...) for decomposable fns; the
    extra stage costs one small shuffle of |keys|×n_salts rows.
    """
    out_names = [
        f"{fn}_{'star' if c == '*' else c}" for c, fn in aggs
    ]
    salted = with_salt(df, n_salts, from_cols=salt_from)
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            _PARTIAL[fn](c).alias(name)
            for (c, fn), name in zip(aggs, out_names)
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _COMBINE[fn](name).alias(name)
            for (_, fn), name in zip(aggs, out_names)
        ]
    )
