"""Corpus-cleaning and time-series repair queries.

Four operator families a production training-data / analytics pipeline
needs that the rest of the registry doesn't yet cover:

- PII detection + redaction (regex, scan-local — the standard
  pre-release scrub step for web corpora);
- token-boundary blocklist filtering (badword filtering without the
  substring false-positive problem);
- calendar gap-fill with forward-fill (date spine + last-non-null
  carry — time-series repair for downstream models);
- time-weighted average (value held until the next observation,
  weighted by holding duration — the correct mean for irregularly
  sampled series).

All are pure Catalyst expressions — no Python in the hot path. The
regexes are written to the common subset of Java regex (Spark) and
RE2 (DuckDB): no backreferences, no lookaround.

Reference parity note: the reference pipeline's only string hygiene is
TRIM + ``<> ''`` (EnrichmentApp.java:229-231); these queries extend the
same scan-local-scrub idea to the corpus-cleaning operators the north
star asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.plans.registry import register


def _t(spark: SparkSession, sf_dir: str, *tables: str):
    views = register_views(spark, sf_dir, tables=tables)
    return [views[t] for t in tables]


# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

# Common Java-regex / RE2 subset; no lookaround, no backreferences.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+[0-9]{2} [0-9]{3}-[0-9]{4}"

# The synthetic `documents.text` is PII-free word soup, so the query
# first plants one deterministic email + phone per doc (derived from
# doc_id), then runs the actual operator: count matches, redact, and
# fingerprint the scrubbed text. Both engines plant identically, so
# the oracle checks the *redaction*, not the planting.
_PII_TEXT_SQL = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) "
    "|| '@mail.example.com or +' "
    "|| lpad(CAST(10 + doc_id % 90 AS VARCHAR), 2, '0') || ' ' "
    "|| lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@register(
    "doc_pii_redaction",
    f"""
WITH planted AS (
  SELECT doc_id, {_PII_TEXT_SQL} AS text FROM documents
),
scrubbed AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
         len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
         regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                        '{PHONE_RE}', '<PHONE>', 'g') AS redacted
  FROM planted
)
SELECT doc_id, n_emails, n_phones,
       length(redacted) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM scrubbed
""",
    doc="PII scrub: detect + redact emails and phone numbers with "
    "shared Java/RE2 regexes. Scan-local (no shuffle at all — the "
    "plan is a single projected scan); at 100 TB this runs at IO "
    "speed. md5 of the redacted text proves byte-identical scrubbing "
    "across engines.",
    tags=("text", "cleaning", "documents"),
)
def q_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _t(spark, sf_dir, "documents")
    planted = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or +"),
        F.lpad((F.lit(10) + F.col("doc_id") % 90).cast("string"), 2, "0"),
        F.lit(" "),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(planted, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count(planted, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(planted, F.lit(PHONE_RE)).alias("n_phones"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


# --------------------------------------------------------------------------
# Token-boundary blocklist filter
# --------------------------------------------------------------------------

BLOCKLIST = ["dup", "error", "drop"]


@register(
    "doc_blocklist_filter",
    f"""
WITH toks AS (
  SELECT doc_id, lang,
         regexp_split_to_array(lower(trim(text)), '\\s+') AS t
  FROM documents
)
SELECT doc_id, lang,
       len(t) AS n_tokens,
       len(list_filter(t, x -> x IN ({", ".join("'" + w + "'" for w in BLOCKLIST)})))
           AS n_blocked,
       round(len(list_filter(t, x -> x IN ({", ".join("'" + w + "'" for w in BLOCKLIST)})))
             * 1.0 / len(t), 6) AS blocked_frac,
       CAST(len(list_filter(t, x -> x IN ({", ".join("'" + w + "'" for w in BLOCKLIST)}))) = 0
            AS BOOLEAN) AS is_clean
FROM toks
""",
    doc="Blocklist filtering on token boundaries (array membership, "
    "not substring LIKE — 'dup' must not flag 'dedupe'). Scan-local "
    "HOF filter over the token array; zero shuffle. The is_clean flag "
    "is the keep-predicate a cleaning pipeline would push into the "
    "scan.",
    tags=("text", "cleaning", "documents"),
)
def q_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    (docs,) = _t(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    blocked = F.filter(toks, lambda x: x.isin(BLOCKLIST))
    return docs.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(blocked).alias("n_blocked"),
        F.round(F.size(blocked) / F.size(toks), 6).alias("blocked_frac"),
        (F.size(blocked) == 0).alias("is_clean"),
    )


# --------------------------------------------------------------------------
# Calendar gap-fill + forward fill
# --------------------------------------------------------------------------


@register(
    "orders_daily_gapfill",
    """
WITH bounds AS (
  SELECT CAST(min(o_orderdate) AS DATE) AS d0,
         CAST(max(o_orderdate) AS DATE) AS d1
  FROM orders
),
spine AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
daily AS (
  -- The daily mean is kept in integer fixed-point (1e-4 currency
  -- units): cents-rounding the sum collapses the engines' different
  -- summation orders, and integer division is exact — a float mean
  -- lands on .xxxx5 half-boundaries that round differently per engine.
  SELECT CAST(o_orderdate AS DATE) AS day,
         count(*) AS n,
         round(sum(o_totalprice), 2) AS revenue,
         (CAST(round(sum(o_totalprice) * 100) AS BIGINT) * 100) // count(*)
             AS avg_price_e4
  FROM orders GROUP BY 1
)
SELECT s.day,
       coalesce(d.n, 0) AS n_orders,
       coalesce(d.revenue, 0.0) AS revenue,
       last_value(d.avg_price_e4 IGNORE NULLS) OVER (
         ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS ffill_avg_price_e4
FROM spine s LEFT JOIN daily d USING (day)
""",
    doc="Time-series repair: dense date spine (sequence/generate_series "
    "between the observed bounds), zero-fill counts, forward-fill the "
    "last observed daily average (last IGNORE NULLS). The spine is "
    "calendar-bounded (~2.4k rows regardless of fact size) so the "
    "single-partition ordered window is safe at any scale; the daily "
    "pre-aggregate is the only shuffle over the fact table.",
    tags=("sql", "timeseries", "orders"),
)
def q_daily_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    spine = bounds.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.round(F.sum("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        )
        .select(
            "day", "n", "revenue", F.expr("(cents * 100) div n").alias("avg_price_e4")
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.last("avg_price_e4", ignorenulls=True)
            .over(w)
            .alias("ffill_avg_price_e4"),
        )
    )


# --------------------------------------------------------------------------
# Time-weighted average
# --------------------------------------------------------------------------


@register(
    "events_time_weighted_avg",
    """
WITH seq AS (
  SELECT user_id, value, epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS t_next
  FROM events
)
SELECT user_id,
       count(*) AS n_intervals,
       round(sum(value * (t_next - t)) / sum(t_next - t), 4) AS twa_value,
       round(avg(value), 4) AS naive_avg
FROM seq
WHERE t_next IS NOT NULL
GROUP BY user_id
""",
    doc="Time-weighted average per user: each value is held until the "
    "next observation and weighted by the holding duration (µs-exact "
    "integer arithmetic), the correct mean for irregular sampling — "
    "shown against the naive row mean. One shuffle on user_id shared "
    "by the lead() window and the aggregate (Catalyst reuses the "
    "partitioning, no second exchange). Tie-break on (ts, event_id) "
    "makes lead() deterministic.",
    tags=("sql", "timeseries", "events"),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    seq = events.select(
        "user_id",
        "value",
        us.alias("t"),
        F.lead(us).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull())
    dt = F.col("t_next") - F.col("t")
    return seq.groupBy("user_id").agg(
        F.count("*").alias("n_intervals"),
        F.round(F.sum(F.col("value") * dt) / F.sum(dt), 4).alias("twa_value"),
        F.round(F.avg("value"), 4).alias("naive_avg"),
    )


# --------------------------------------------------------------------------
# Z-order (Morton) clustering key
# --------------------------------------------------------------------------

_ZBITS = 8


def _z_sql(xe: str, ye: str, bits: int) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({xe} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({ye} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "events_zorder_key",
    f"""
SELECT event_id,
       (user_id & 255) AS zx,
       (CAST(floor(value) AS BIGINT) & 255) AS zy,
       {_z_sql("(user_id & 255)", "(CAST(floor(value) AS BIGINT) & 255)", _ZBITS)}
           AS zvalue
FROM events
""",
    doc="Morton (Z-order) interleaving key over two event dimensions — "
    "the clustering key operators/maintenance.py:zorder_cluster "
    "range-partitions by. Pure bitwise Catalyst expressions (16 "
    "shift/mask terms at 8 bits), scan-local, bit-exact across "
    "engines; tests/test_maintenance.py proves the resulting layout "
    "actually skips files on BOTH dimensions.",
    tags=("maintenance", "clustering", "events"),
)
def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.maintenance import zvalue_expr

    (events,) = _t(spark, sf_dir, "events")
    x = F.col("user_id").bitwiseAND(F.lit(255))
    y = F.floor("value").cast("long").bitwiseAND(F.lit(255))
    return events.select(
        "event_id",
        x.alias("zx"),
        y.alias("zy"),
        zvalue_expr(x, y, _ZBITS).alias("zvalue"),
    )
