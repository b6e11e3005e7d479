"""Cleaning / time-series query contracts that the oracle hash can't
express: plan shape (scan-local, no shuffle), token-boundary
semantics, gap-fill zero rows, and a hand-computed time-weighted mean.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row, functions as F

from flink_application_spark.plans.cleaning_queries import (
    BLOCKLIST,
    q_blocklist_filter,
    q_pii_redaction,
)
from flink_application_spark.plans.registry import REGISTRY_GET


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_pii_and_blocklist_are_scan_local(spark, sf_dir):
    """Both scrub queries must compile to a single projected scan —
    any Exchange here would shuffle the full corpus at 100 TB."""
    for q in (q_pii_redaction, q_blocklist_filter):
        plan = _executed_plan(q(spark, sf_dir))
        assert "Exchange" not in plan, plan


def test_pii_redaction_removes_all_matches(spark, sf_dir):
    out = q_pii_redaction(spark, sf_dir)
    assert out.filter((F.col("n_emails") < 1) | (F.col("n_phones") < 1)).count() == 0
    # redacted text must carry the placeholders, hence length >= planted
    assert out.filter(F.col("redacted_len") <= 0).count() == 0


def test_blocklist_is_token_boundary(spark):
    df = spark.createDataFrame(
        [
            (1, "clean words only"),
            (2, "an error occurred"),
            (3, "deduplicate is fine but dup is not"),
            (4, "dropout droplet backdrop"),  # substrings must NOT flag
        ],
        "doc_id bigint, text string",
    ).withColumn("lang", F.lit("en"))
    df.createOrReplaceTempView("documents")
    try:
        toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        blocked = F.filter(toks, lambda x: x.isin(BLOCKLIST))
        got = {
            r["doc_id"]: r["n"]
            for r in df.select("doc_id", F.size(blocked).alias("n")).collect()
        }
        assert got == {1: 0, 2: 1, 3: 1, 4: 0}
    finally:
        spark.catalog.dropTempView("documents")


def test_gapfill_dense_spine_and_zero_days(spark, sf_dir):
    spec = REGISTRY_GET("orders_daily_gapfill")
    rows = spec.spark(spark, sf_dir).orderBy("day").collect()
    days = [r["day"] for r in rows]
    # dense: every calendar day between bounds exactly once
    assert days[0] + dt.timedelta(days=len(days) - 1) == days[-1]
    assert len(set(days)) == len(days)
    zero_days = [r for r in rows if r["n_orders"] == 0]
    assert zero_days, "sf0.001 must have order-free days"
    # zero-filled metrics but forward-filled price after the first sale
    first_sale = next(i for i, r in enumerate(rows) if r["n_orders"] > 0)
    for r in zero_days:
        assert r["revenue"] == 0.0
    for r in rows[first_sale:]:
        assert r["ffill_avg_price_e4"] is not None and r["ffill_avg_price_e4"] > 0


def test_time_weighted_avg_hand_computed(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: value 10 held 1s, then 30 held 3s -> twa = (10*1+30*3)/4 = 25
        Row(event_id=1, ts=t0, user_id=1, value=10.0),
        Row(event_id=2, ts=t0 + dt.timedelta(seconds=1), user_id=1, value=30.0),
        Row(event_id=3, ts=t0 + dt.timedelta(seconds=4), user_id=1, value=99.0),
        # user 2: single event -> no interval -> absent from output
        Row(event_id=4, ts=t0, user_id=2, value=5.0),
    ]
    df = spark.createDataFrame(rows)
    df.createOrReplaceTempView("events")
    try:
        # the registered query re-points views at sf_dir, so run the
        # same formulation directly over this fixture view
        out = spark.sql(
            """
            WITH seq AS (
              SELECT user_id, value,
                     unix_micros(CAST(ts AS TIMESTAMP)) AS t,
                     lead(unix_micros(CAST(ts AS TIMESTAMP))) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS t_next
              FROM events
            )
            SELECT user_id,
                   round(sum(value * (t_next - t)) / sum(t_next - t), 4)
                       AS twa_value
            FROM seq WHERE t_next IS NOT NULL GROUP BY user_id
            """
        ).collect()
        got = {r["user_id"]: r["twa_value"] for r in out}
        assert got == {1: 25.0}
    finally:
        spark.catalog.dropTempView("events")


def test_luhn_sum_sql_validates_known_cards(spark):
    """The generated Luhn SQL must accept canonical valid test numbers
    and reject single-digit corruptions."""
    from flink_application_spark.plans.cleaning_queries import _LUHN16_C

    cases = [
        ("4111111111111111", True),   # canonical Visa test number
        ("5500005555555559", True),   # canonical MC test number
        ("4111111111111112", False),  # corrupted check digit
        ("4111111111111121", False),  # corrupted body digit
    ]
    df = spark.createDataFrame([(c,) for c, _ in cases], "c string")
    got = {
        r.c: r.ok
        for r in df.selectExpr("c", f"({_LUHN16_C} % 10 = 0) AS ok").collect()
    }
    assert got == {c: ok for c, ok in cases}


def test_luhn_query_accepts_exactly_the_valid_plant(spark, sf_dir):
    from pyspark.sql import functions as F
    from flink_application_spark.plans.registry import REGISTRY_GET

    df = REGISTRY_GET("doc_pii_luhn_cards").spark(spark, sf_dir)
    assert (
        df.filter(
            (F.col("n_candidates") != 2) | (F.col("n_luhn_valid") != 1)
        ).count()
        == 0
    )


def test_quality_threshold_sweep_curve_shape(spark, sf_dir):
    """The yield curve must be monotone non-increasing in the
    threshold, cover all 10 thresholds, and keep everything at 0.0
    (quality is non-negative by construction)."""
    from flink_application_spark.plans.registry import REGISTRY_GET

    rows = {
        r.t10: r
        for r in REGISTRY_GET("doc_quality_threshold_sweep")
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(rows) == set(range(10))
    n_docs = rows[0].n_kept
    assert rows[0].kept_ppm == 1_000_000
    prev = None
    for t in range(10):
        r = rows[t]
        assert 0 <= r.n_kept <= n_docs
        assert 0 <= r.kept_ppm <= 1_000_000
        if prev is not None:
            assert r.n_kept <= prev.n_kept
            assert r.kept_chars <= prev.kept_chars
        prev = r


def test_token_budget_planner_invariants(spark, sf_dir):
    """Greedy fill semantics: ranks contiguous, every allocation within
    its source's tokens, the total allocation exactly equals the
    budget (half the corpus tokens — the corpus always covers it), and
    the allocation is prefix-shaped: fully-funded sources, then at most
    one partial, then zeros."""
    from flink_application_spark.plans.registry import REGISTRY_GET

    rows = sorted(
        REGISTRY_GET("corpus_token_budget_planner").spark(spark, sf_dir).collect(),
        key=lambda r: r.rank,
    )
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    total = sum(r.src_tokens for r in rows)
    budget = total // 2
    assert sum(r.alloc_tokens for r in rows) == budget
    for r in rows:
        assert 0 <= r.alloc_tokens <= r.src_tokens
    state = "full"
    for r in rows:
        if state == "full" and r.alloc_tokens == r.src_tokens:
            continue
        if state == "full" and 0 < r.alloc_tokens < r.src_tokens:
            state = "tail"
            continue
        if r.alloc_tokens == 0:
            state = "tail"
            continue
        raise AssertionError(f"allocation not prefix-shaped at rank {r.rank}")
    # quality ordering: avg_qppm non-increasing with rank
    qs = [r.avg_qppm for r in rows]
    assert qs == sorted(qs, reverse=True)
