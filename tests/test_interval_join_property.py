"""Property-based check of the interval join's band semantics.

`tests/test_streaming.py` pins stream≡batch on a fixture; this drives
the same function (batch mode — identical condition, watermarks no-op)
with hypothesis-generated timestamps against a brute-force reference
of `left_ts ∈ [right_ts - lower, right_ts + upper]`, including
boundary-exact hits, duplicate keys/timestamps, and one-sided keys.
"""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_application_spark.streaming.interval_join import interval_join

BASE = dt.datetime(2024, 1, 1)
LOWER_S, UPPER_S = 7, 3

_key = st.sampled_from([1, 2, 3])
_ts = st.integers(min_value=0, max_value=25)
_left = st.lists(st.tuples(_key, _ts), min_size=0, max_size=10)
_right = st.lists(st.tuples(_key, _ts), min_size=0, max_size=10)


def _brute(left_rows, right_rows):
    out = []
    for lk, lt in left_rows:
        for rk, rt in right_rows:
            if lk == rk and rt - LOWER_S <= lt <= rt + UPPER_S:
                out.append((lk, lt, rt))
    return sorted(out)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(left_rows=_left, right_rows=_right)
def test_interval_join_band_matches_brute_force(spark, left_rows, right_rows):
    def ts(s):
        return BASE + dt.timedelta(seconds=s)

    left = spark.createDataFrame(
        [(k, ts(t)) for k, t in left_rows] or [(0, BASE)], "lk bigint, lt timestamp"
    )
    if not left_rows:
        left = left.filter("lk <> 0")
    right = spark.createDataFrame(
        [(k, ts(t)) for k, t in right_rows] or [(0, BASE)], "rk bigint, rt timestamp"
    )
    if not right_rows:
        right = right.filter("rk <> 0")

    got = interval_join(
        left,
        right,
        F.col("lk") == F.col("rk"),
        left_ts="lt",
        right_ts="rt",
        lower=f"{LOWER_S} seconds",
        upper=f"{UPPER_S} seconds",
        left_watermark="0 seconds",
        right_watermark="0 seconds",
    ).collect()
    got_rows = sorted(
        (r.lk, int((r.lt - BASE).total_seconds()), int((r.rt - BASE).total_seconds()))
        for r in got
    )
    assert got_rows == _brute(left_rows, right_rows)
