"""CEP queries over the events table — Flink's CEP / MATCH_RECOGNIZE
capability re-expressed Spark-first.

Four registrations:

- `events_cep_signup_purchase_no_error` — a join-expressible pattern
  (per signup: the FIRST purchase within 1 hour, invalidated by any
  error strictly between), fully oracle-checked. The negation
  ("no C between A and B") is the CEP construct equi-joins handle
  with an anti-join, no automaton needed.
- `events_cep_funnel_matches` — the generic automaton
  (`operators/cep.py:match_pattern`): signup → click → purchase
  within 24 hours, non-overlapping earliest matches (MATCH_RECOGNIZE
  AFTER MATCH SKIP PAST LAST ROW). Greedy non-overlapping matching is
  inherently iterative — not SQL-expressible — so it is rows-only at
  the driver gate with the semantics pinned against a pure-Python
  reference in `tests/test_cep.py`.
- `events_cep_error_burst_recovery` — the quantified automaton
  (Kleene plus, greedy): error+ → purchase, emitting burst sizes.
- `events_cep_clean_checkout` — the negation automaton
  (notFollowedBy guard): signup → purchase, no error between.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.cep import match_pattern
from flink_application_spark.plans.registry import register


@register(
    "events_cep_signup_purchase_no_error",
    """
WITH s AS (
  SELECT user_id, ts AS signup_ts, event_id AS signup_id
  FROM events WHERE event_type = 'signup'
),
p AS (
  SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
),
firstp AS (
  SELECT s.user_id AS user_id, s.signup_id AS signup_id,
         s.signup_ts AS signup_ts,
         min(p.purchase_ts) AS purchase_ts
  FROM s JOIN p
    ON p.user_id = s.user_id
   AND p.purchase_ts > s.signup_ts
   AND p.purchase_ts <= s.signup_ts + INTERVAL 1 HOUR
  GROUP BY s.user_id, s.signup_id, s.signup_ts
)
SELECT f.user_id AS user_id, f.signup_id AS signup_id,
       f.signup_ts AS signup_ts, f.purchase_ts AS purchase_ts
FROM firstp f
WHERE NOT EXISTS (
  SELECT 1 FROM events e
  WHERE e.user_id = f.user_id AND e.event_type = 'error'
    AND e.ts > f.signup_ts AND e.ts < f.purchase_ts
)
""",
    doc="Join-expressible CEP pattern: per signup the FIRST purchase "
    "within 1 hour, suppressed when any error falls strictly between — "
    "equi+range join, min-aggregate, interval anti-join. The standard "
    "'A followed by B with no C between' shape without an automaton.",
    tags=("events", "cep"),
)
def q_signup_purchase_no_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, tables=("events",))["events"]
    s = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("ts").alias("signup_ts"),
        F.col("event_id").alias("signup_id"),
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts")
    )
    firstp = (
        s.join(
            p,
            (F.col("p_user") == F.col("user_id"))
            & (F.col("purchase_ts") > F.col("signup_ts"))
            & (F.col("purchase_ts") <= F.col("signup_ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .groupBy("user_id", "signup_id", "signup_ts")
        .agg(F.min("purchase_ts").alias("purchase_ts"))
    )
    err = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("e_user"), F.col("ts").alias("e_ts")
    )
    bad = (
        firstp.join(
            err,
            (F.col("e_user") == F.col("user_id"))
            & (F.col("e_ts") > F.col("signup_ts"))
            & (F.col("e_ts") < F.col("purchase_ts")),
            "left_semi",
        )
    )
    return firstp.join(
        bad, ["user_id", "signup_id", "signup_ts", "purchase_ts"], "left_anti"
    ).select("user_id", "signup_id", "signup_ts", "purchase_ts")


@register(
    "events_cep_funnel_matches",
    None,  # greedy non-overlapping matching is iterative — not SQL-expressible
    doc="Generic CEP automaton: signup → click → purchase per user "
    "within 24 hours, earliest non-overlapping matches (AFTER MATCH "
    "SKIP PAST LAST ROW). Predicates evaluate scan-local as boolean "
    "columns; the per-key walk is an Arrow-batched applyInPandas with "
    "O(steps) state — the batch form of Flink's CEP NFA. Semantics "
    "pinned against a pure-Python reference in tests/test_cep.py.",
    tags=("events", "cep"),
)
def q_cep_funnel_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, tables=("events",))["events"]
    out = match_pattern(
        ev,
        key_col="user_id",
        ts_col="ts",
        steps=[
            F.col("event_type") == "signup",
            F.col("event_type") == "click",
            F.col("event_type") == "purchase",
        ],
        within_seconds=86400,
        id_col="event_id",
    )
    return out.withColumnRenamed("key", "user_id")


@register(
    "events_cep_error_burst_recovery",
    None,  # Kleene-greedy matching is iterative — not SQL-expressible
    doc="Quantified CEP (Kleene plus): one-or-more errors (greedy — "
    "the whole burst absorbed into one match) followed by a purchase "
    "within 24 hours, per user, non-overlapping. Emits the burst size "
    "(step_1_n) — the 'how many failures before recovery' signal. "
    "Semantics pinned by tests/test_cep_quantifiers.py and the "
    "hypothesis contracts in tests/test_cep_property.py.",
    tags=("events", "cep"),
)
def q_cep_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, tables=("events",))["events"]
    out = match_pattern(
        ev,
        key_col="user_id",
        ts_col="ts",
        steps=[
            F.col("event_type") == "error",
            F.col("event_type") == "purchase",
        ],
        within_seconds=86400,
        id_col="event_id",
        quantifiers=["oneOrMore", "once"],
    )
    return out.withColumnRenamed("key", "user_id")


@register(
    "events_cep_clean_checkout",
    None,  # automaton semantics (consuming, non-overlapping) — not SQL-expressible
    doc="Negation CEP (notFollowedBy): signup → purchase within 1 hour "
    "with NO error strictly between the bindings — the automaton form "
    "of the join-expressible events_cep_signup_purchase_no_error "
    "(which stays the oracle-checked variant; this one is CONSUMING "
    "and non-overlapping, so a purchase satisfies at most one signup). "
    "Guard semantics pinned in tests/test_cep_quantifiers.py.",
    tags=("events", "cep"),
)
def q_cep_clean_checkout(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = register_views(spark, sf_dir, tables=("events",))["events"]
    out = match_pattern(
        ev,
        key_col="user_id",
        ts_col="ts",
        steps=[
            F.col("event_type") == "signup",
            F.col("event_type") == "purchase",
        ],
        within_seconds=3600,
        id_col="event_id",
        not_between=[F.col("event_type") == "error"],
    )
    return out.withColumnRenamed("key", "user_id")
