"""Wilson lower-bound source ranking: the bound must shrink toward 0.5
under small n (a 3/3 source must not outrank a 9500/10000 one), match a
pure-Python recomputation, and rank by the bound."""

from __future__ import annotations

import math

from flink_application_spark.plans.registry import REGISTRY_GET


def _wilson(k: int, n: int) -> float:
    p = k / n
    zz = 1.96 * 1.96
    return round(
        ((p + zz / (2 * n)) - 1.96 * math.sqrt((p * (1.0 - p) + zz / (4 * n)) / n))
        / (1.0 + zz / n)
        + 0.0,
        6,
    )


def test_matches_python_and_ranks_by_bound(spark, sf_dir):
    rows = REGISTRY_GET("source_quality_wilson").spark(spark, sf_dir).collect()
    assert rows, "empty result"
    for r in rows:
        assert r.wilson_lb == _wilson(r.n_good, r.n_docs)
        if r.n_good > 0:
            assert r.wilson_lb < r.good_rate, "bound must shrink the raw rate"
    by_rank = sorted(rows, key=lambda r: r.rank)
    assert all(
        a.wilson_lb >= b.wilson_lb for a, b in zip(by_rank, by_rank[1:])
    ), "rank must follow the bound"


def test_small_n_does_not_outrank_large_n():
    # 3/3 raw rate 1.0 vs 9500/10000 raw rate 0.95: the bound flips it.
    assert _wilson(3, 3) < _wilson(9500, 10000)
