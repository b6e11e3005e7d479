"""Streaming layer tests (SURVEY §5: batch-vs-stream equivalence).

The same operator library runs the CDR pipeline in batch
(plans/cdr.py) and streaming (streaming/pipeline.py); these tests
assert the stream output equals the batch output on identical input,
plus unit coverage of the stream-only pieces (CSV decode semantics,
session-gap splitting, partitioned parquet sink, rate generator).
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row, functions as F

from flink_application_spark.plans.cdr import CANONICAL, cdr_views
from flink_application_spark.sources.csv_decode import (
    decode_csv_value,
    encode_csv_value,
)
from flink_application_spark.sources.generator import PROBES, batch_cdr, stream_cdr
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.dedup import session_argmax_dedup
from flink_application_spark.streaming.pipeline import streaming_enrichment
from flink_application_spark.streaming.sinks import (
    fanout_union,
    write_memory,
    write_partitioned_parquet,
)

pytestmark = pytest.mark.usefixtures("spark")


# ---------------------------------------------------------------------------
# CSV decode/encode (S1 semantics, hermetic)
# ---------------------------------------------------------------------------


def test_csv_decode_null_literal_and_malformed(spark):
    lines = [
        # full row
        "2024-01-02 03:04:05,DE-probe-1,250000000001,79000000001,;10.1.0.1;,42",
        # empty fields → NULL (value.csv.null-literal = '')
        "2024-01-02 03:04:06,cl-probe-2,,,;10.2.0.1;,43",
        # malformed (bad timestamp + bad long) → dropped (ignore-parse-errors)
        "not-a-timestamp,xx,abc,def,;10.3.0.1;,nope",
    ]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    out = decode_csv_value(df).collect()
    assert len(out) == 2
    assert out[0].imsi == 250000000001 and out[0].unique_cdr_id == 42
    assert out[1].imsi is None and out[1].msisdn is None
    assert out[1].measuring_probe_name == "cl-probe-2"


def test_csv_encode_decode_roundtrip(spark):
    rows = [("2024-01-02 03:04:05", "DE...", 250000000001, None, ";10.1.0.1;", 7)]
    df = spark.createDataFrame(
        rows,
        "start_time string, measuring_probe_name string, imsi bigint, "
        "msisdn bigint, ms_ip_address string, unique_cdr_id bigint",
    ).withColumn("start_time", F.to_timestamp("start_time"))
    back = decode_csv_value(encode_csv_value(df)).collect()[0]
    assert back.imsi == 250000000001
    assert back.msisdn is None
    assert back.ms_ip_address == ";10.1.0.1;"


# ---------------------------------------------------------------------------
# Session-window arg-max dedup (W1/W2): gap semantics + batch parity
# ---------------------------------------------------------------------------


def _ts(s: str):
    return F.to_timestamp(F.lit(s))


def test_session_gap_splits_and_argmax(spark):
    # key 1: two bursts 10 s apart (gap 1 s) → two sessions, each emits
    # its own arg-max; key 2: one burst → one row.
    data = [
        (1, "2024-01-01 00:00:00.0", "a"),
        (1, "2024-01-01 00:00:00.5", "b"),  # same session, later → wins
        (1, "2024-01-01 00:00:10.0", "c"),  # new session
        (2, "2024-01-01 00:00:03.0", "d"),
    ]
    df = spark.createDataFrame(data, "k int, ts string, v string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = session_argmax_dedup(
        df, key_cols=["k"], order_col="ts", ts_col="ts", gap="1 second"
    )
    got = {(r.k, r.v) for r in out.collect()}
    assert got == {(1, "b"), (1, "c"), (2, "d")}


# ---------------------------------------------------------------------------
# Batch ≡ stream equivalence on the full enrichment pipeline
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def cdr_parquet(spark, sf_dir, tmp_path_factory):
    """Materialize the sf0.001 CDR fixtures as parquet dirs; the src dir
    gets an extra far-future sentinel file so the stream's watermark
    passes every real session before the availableNow run ends."""
    root = tmp_path_factory.mktemp("cdr_stream")
    v = cdr_views(spark, sf_dir)
    # watermarks need TimestampType (not NTZ) — cast once here.
    src = v["cdr_src"].withColumn("start_time", F.col("start_time").cast("timestamp"))
    dim_row = v["ms_ip"].first()
    src.write.parquet(str(root / "src"))
    sentinel = spark.createDataFrame(
        [
            (
                dim_row.probe + "-sentinel",
                None,
                None,
                dim_row.ms_ip_address,
                -1,
            )
        ],
        "measuring_probe_name string, imsi bigint, msisdn bigint, ms_ip_address string, unique_cdr_id bigint",
    ).select(
        _ts("2099-01-01 00:00:00").alias("start_time"),
        "measuring_probe_name",
        "imsi",
        "msisdn",
        "ms_ip_address",
        "unique_cdr_id",
    )
    sentinel.write.mode("append").parquet(str(root / "src"))
    v["imsi_msisdn"].write.parquet(str(root / "imsi_msisdn"))
    v["ms_ip"].withColumn(
        "start_time", F.col("start_time").cast("timestamp")
    ).write.parquet(str(root / "ms_ip"))
    return root


def test_stream_equals_batch_enrichment(spark, cdr_parquet):
    # all files in ONE batch: the 2099 sentinel then advances the
    # watermark past every real session's END (session end = last event
    # + gap, so the gap must stay small relative to the sentinel's
    # lead) and the final no-data micro-batch flushes the session
    # state. (With maxFilesPerTrigger the sentinel could land in batch
    # 1 and make all real data late.)
    src_stream = file_stream(spark, str(cdr_parquet / "src"))
    imsi_msisdn = spark.read.parquet(str(cdr_parquet / "imsi_msisdn"))
    ms_ip = spark.read.parquet(str(cdr_parquet / "ms_ip"))

    gap = "1 hour"
    result = streaming_enrichment(
        src_stream,
        imsi_msisdn,
        ms_ip,
        gap=gap,
        watermark_delay="0 seconds",
    )
    q = write_memory(result, "stream_out")
    q.awaitTermination(300)

    got = spark.table("stream_out").filter(F.col("unique_cdr_id") != -1)

    # batch reference: the SAME pipeline function on a batch DataFrame —
    # session_window + max_by run identically in batch mode, so this is
    # a pure execution-engine equivalence check (unified-API guarantee).
    src_batch = spark.read.parquet(str(cdr_parquet / "src")).filter(
        F.col("unique_cdr_id") != -1
    )
    expected = streaming_enrichment(
        src_batch, imsi_msisdn, ms_ip, gap=gap, watermark_delay="0 seconds"
    )

    g = sorted(tuple(r) for r in got.select(*CANONICAL).collect())
    e = sorted(tuple(r) for r in expected.select(*CANONICAL).collect())
    assert len(g) > 0
    assert g == e
    # and path B actually contributed (enriched msisdn from ms_ip dim)
    assert got.filter(F.col("msisdn") >= 79002000000).count() > 0


def test_batch_session_dedup_vs_windowrank(spark, cdr_parquet):
    """With one session per key (gap ≥ data span), the session arg-max
    equals the reference's global per-key arg-max (window-rank form) —
    ties the streaming dedup semantics back to the batch oracle."""
    imsi_msisdn = spark.read.parquet(str(cdr_parquet / "imsi_msisdn"))
    ms_ip = spark.read.parquet(str(cdr_parquet / "ms_ip"))
    src = spark.read.parquet(str(cdr_parquet / "src")).filter(
        F.col("unique_cdr_id") != -1
    )
    via_session = streaming_enrichment(
        src, imsi_msisdn, ms_ip, gap="36500 days", watermark_delay="0 seconds"
    )
    via_rank = _batch_reference(spark, src, imsi_msisdn, ms_ip)
    g = sorted(tuple(r) for r in via_session.select(*CANONICAL).collect())
    e = sorted(tuple(r) for r in via_rank.select(*CANONICAL).collect())
    assert g == e


def _batch_reference(spark, src, imsi_msisdn, ms_ip):
    """Batch form of the same pipeline via the shared operator library
    (plans/cdr.py path A + path B with window-rank dedup)."""
    from flink_application_spark.operators.dedup import argmax_dedup
    from flink_application_spark.operators.enrichment import (
        coalesce_enrich,
        explode_delimited,
        extend_with_partition_cols,
        lookup_join,
        select_canonical,
        theta_asof_candidates,
    )
    from flink_application_spark.plans.cdr import _ASOF_ORDER_SPARK

    extended = extend_with_partition_cols(src)
    a = lookup_join(
        extended.filter(F.col("imsi").isNotNull()),
        imsi_msisdn,
        on=F.col("imsi") == F.col("_imsi"),
        project={"_imsi": "imsi", "_msisdn": "msisdn"},
        how="inner",
    )
    a = select_canonical(
        coalesce_enrich(a, {"imsi": "_imsi", "msisdn": "_msisdn"}), CANONICAL
    )
    exploded = explode_delimited(
        extended.filter(F.col("imsi").isNull()), "ms_ip_address", out_col="ip"
    )
    dim = explode_delimited(ms_ip, "ms_ip_address", out_col="ip").select(
        F.col("start_time").alias("_start_time"),
        F.col("imsi").alias("_imsi"),
        F.col("msisdn").alias("_msisdn"),
        F.col("probe").alias("_probe"),
        F.col("ip").alias("_ip"),
    )
    candidates = theta_asof_candidates(
        exploded,
        dim,
        equi_keys=[("probe", "_probe"), ("ip", "_ip")],
        left_ts="start_time",
        right_ts="_start_time",
    )
    best = argmax_dedup(candidates, ["unique_cdr_id"], _ASOF_ORDER_SPARK)
    b = select_canonical(
        coalesce_enrich(best, {"imsi": "_imsi", "msisdn": "_msisdn"}), CANONICAL
    )
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# Partitioned parquet sink (S4) + union fan-in (S6/R4)
# ---------------------------------------------------------------------------


def test_partitioned_parquet_sink(spark, cdr_parquet, tmp_path):
    src_stream = file_stream(spark, str(cdr_parquet / "src"))
    from flink_application_spark.operators.enrichment import (
        extend_with_partition_cols,
    )

    extended = extend_with_partition_cols(src_stream)
    out = str(tmp_path / "sink")
    q = write_partitioned_parquet(
        extended,
        out,
        checkpoint=str(tmp_path / "ckpt"),
        trigger=None,
        max_records_per_file=100_000,
        query_name="sink_test",
    )
    q.awaitTermination(300)

    parts = glob.glob(os.path.join(out, "event_date=*", "probe=*"))
    assert parts, "expected hive-style event_date=/probe= partition dirs"
    back = spark.read.parquet(out)
    n_src = spark.read.parquet(str(cdr_parquet / "src")).count()
    assert back.count() == n_src


def test_fanout_union_single_committer(spark, cdr_parquet):
    a = spark.read.parquet(str(cdr_parquet / "src")).limit(5)
    b = spark.read.parquet(str(cdr_parquet / "src")).limit(3)
    assert fanout_union([a, b]).count() == 8


# ---------------------------------------------------------------------------
# Generator (S7-S9 / M4)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gen_dim(spark):
    rows = [(250000000000 + i, 79000000000 + i, f"10.{i}.0.1") for i in range(20)]
    return spark.createDataFrame(rows, "imsi bigint, msisdn bigint, ip string")


def test_batch_generator_distributions(spark, gen_dim):
    n = 2000
    df = batch_cdr(spark, gen_dim, n, seed=7).cache()
    assert df.count() == n
    # probe names: one of the 15 codes + "..." (CsvData.java:133-135)
    probes = {r.measuring_probe_name for r in df.select("measuring_probe_name").distinct().collect()}
    assert probes <= {p + "..." for p in PROBES}
    assert len(probes) > 5
    # ip wrapping ";ip;" (CsvData.java:145-147)
    bad = df.filter(~F.col("ms_ip_address").rlike(r"^;.*;$")).count()
    assert bad == 0
    # null probabilities ~0.5 / ~0.1 (flink.conf:9-10)
    imsi_rate = df.filter(F.col("imsi").isNotNull()).count() / n
    msisdn_rate = df.filter(F.col("msisdn").isNotNull()).count() / n
    assert 0.4 < imsi_rate < 0.6
    assert 0.05 < msisdn_rate < 0.17
    # start_time within the configured window (flink.conf:5-6)
    mn, mx = df.agg(F.min("start_time"), F.max("start_time")).first()
    assert mn.year >= 2022 and mx.year <= 2026
    # determinism under a fixed seed
    again = batch_cdr(spark, gen_dim, n, seed=7)
    assert again.exceptAll(df).count() == 0
    df.unpersist()


def test_stream_generator_shape(spark, gen_dim):
    s = stream_cdr(spark, gen_dim, rows_per_second=10, seed=7)
    assert s.isStreaming
    assert set(s.columns) == {
        "start_time",
        "measuring_probe_name",
        "imsi",
        "msisdn",
        "ms_ip_address",
        "unique_cdr_id",
    }


# ---------------------------------------------------------------------------
# Stream-stream event-time interval join (streaming form of J4's range)
# ---------------------------------------------------------------------------


def test_interval_join_stream_equals_batch(spark, tmp_path):
    from flink_application_spark.streaming.interval_join import interval_join

    # impressions and clicks: a click joins an impression of the same ad
    # if it lands within [impression, impression + 30s].
    imp_rows = [
        (1, "2024-01-01 00:00:00"),
        (1, "2024-01-01 00:01:00"),
        (2, "2024-01-01 00:00:10"),
        (3, "2024-01-01 00:02:00"),
    ]
    clk_rows = [
        (1, "2024-01-01 00:00:20"),   # joins imp@00:00 only
        (1, "2024-01-01 00:01:25"),   # joins imp@01:00 only
        (2, "2024-01-01 00:00:45"),   # 35s after imp@00:10 → no match
        (3, "2024-01-01 00:02:05"),   # joins imp@02:00
        (9, "2024-01-01 00:00:00"),   # no impression at all
        # far-future sentinel rows advance both watermarks so the
        # availableNow run flushes all real matches before terminating
        (99, "2099-01-01 00:00:00"),
    ]
    imp_rows.append((99, "2099-01-01 00:00:00"))
    imp = spark.createDataFrame(
        [(k, t) for k, t in imp_rows], "ad_id bigint, imp_time string"
    ).select("ad_id", F.col("imp_time").cast("timestamp").alias("imp_time"))
    clk = spark.createDataFrame(
        [(k, t) for k, t in clk_rows], "click_ad_id bigint, click_time string"
    ).select("click_ad_id", F.col("click_time").cast("timestamp").alias("click_time"))
    imp.write.parquet(str(tmp_path / "imp"))
    clk.write.parquet(str(tmp_path / "clk"))

    def run(left, right):
        return interval_join(
            left,
            right,
            F.col("click_ad_id") == F.col("ad_id"),
            left_ts="click_time",
            right_ts="imp_time",
            lower="30 seconds",   # click_time >= imp_time - 30s (slack)
            upper="30 seconds",   # click_time <= imp_time + 30s (band)
            left_watermark="0 seconds",
            right_watermark="0 seconds",
        ).filter(F.col("click_time") >= F.col("imp_time"))  # causal half

    batch = run(
        spark.read.parquet(str(tmp_path / "clk")),
        spark.read.parquet(str(tmp_path / "imp")),
    )
    stream = run(
        file_stream(spark, str(tmp_path / "clk")),
        file_stream(spark, str(tmp_path / "imp")),
    )
    assert stream.isStreaming
    q = write_memory(stream, "ij_out")
    q.awaitTermination(300)
    got = spark.table("ij_out").filter(F.col("ad_id") != 99)
    want = batch.filter(F.col("ad_id") != 99)
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
    # expected matches exactly: (1@00:20, 1@01:25, 3@02:05)
    assert got.count() == 3


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Streaming exact dedup with BOUNDED state: duplicates arriving
    within the watermark horizon are dropped even across micro-batches,
    and state for keys older than the watermark is evictable (the
    scale contract — unbounded dropDuplicates state OOMs a 100 TB
    stream; the watermark bound makes dedup state O(horizon), the
    Spark-native analogue of the reference's 1 s session-gap dedup
    `EnrichmentApp.java:142-156`)."""
    rows = [
        (1, "2024-01-01 00:00:00", "a"),
        (1, "2024-01-01 00:00:05", "a-dup"),       # same key, inside horizon
        (2, "2024-01-01 00:00:10", "b"),
        (1, "2024-01-01 00:10:00", "a-again"),     # same key, far later
        (99, "2099-01-01 00:00:00", "sentinel"),   # advances watermark
    ]
    df = spark.createDataFrame(
        rows, "k bigint, ts string, tag string"
    ).select("k", F.col("ts").cast("timestamp").alias("ts"), "tag")
    df.write.parquet(str(tmp_path / "dd"))

    stream = (
        file_stream(spark, str(tmp_path / "dd"))
        .withWatermark("ts", "1 minute")
        .dropDuplicatesWithinWatermark(["k"])
    )
    assert stream.isStreaming
    q = write_memory(stream, "dd_out")
    q.awaitTermination(300)
    got = spark.table("dd_out").filter(F.col("k") != 99)
    tags = sorted(r.tag for r in got.collect())
    # The contract: key 2 survives, key 1 keeps >= 1 row, and the two
    # rows 5 s apart NEVER both survive. Which of them wins depends on
    # in-batch processing order (not event time) — don't pin it; the
    # far-later key-1 row may also survive once its state expired.
    assert "b" in tags
    assert any(t in tags for t in ("a", "a-dup", "a-again"))
    assert not ("a" in tags and "a-dup" in tags)


def test_observed_metrics_per_microbatch(spark, cdr_parquet):
    """df.observe counters appear on StreamingQueryProgress for every
    micro-batch and count exactly the sink-bound rows."""
    from flink_application_spark.streaming.sinks import with_pipeline_metrics

    src_stream = file_stream(spark, str(cdr_parquet / "src"))
    imsi_msisdn = spark.read.parquet(str(cdr_parquet / "imsi_msisdn"))
    ms_ip = spark.read.parquet(str(cdr_parquet / "ms_ip"))
    result = with_pipeline_metrics(
        streaming_enrichment(
            src_stream, imsi_msisdn, ms_ip, gap="1 hour", watermark_delay="0 seconds"
        )
    )
    q = write_memory(result, "observed_out")
    q.awaitTermination(300)
    progresses = [p for p in q.recentProgress if "pipeline_metrics" in (p["observedMetrics"] or {})]
    assert progresses, "no progress carried observedMetrics"
    total = sum(p["observedMetrics"]["pipeline_metrics"]["n_rows"] for p in progresses)
    assert total == spark.table("observed_out").count()


def test_dim_update_visible_within_ttl(spark, cdr_parquet, tmp_path):
    """Flink lookup-cache TTL parity (flink.conf:37-38, round-5 verdict
    item 7): with dims wired through RefreshingDim, a dimension UPDATE
    becomes visible to a RUNNING query once the TTL expires — no
    restart — while batches inside the TTL window keep serving the
    cached generation (bounded dim load: ≤ one reload per TTL,
    regardless of trigger cadence)."""
    import time as _time

    from flink_application_spark.streaming.pipeline import (
        refreshing_enrichment_batch_fn,
    )

    dim_dir = tmp_path / "dim"
    src_dir = tmp_path / "src"
    new_imsi, new_msisdn = 111, 70000000001

    # initial dim: does NOT know new_imsi
    spark.createDataFrame(
        [(222, 70000000002)], "imsi bigint, msisdn bigint"
    ).write.parquet(str(dim_dir))
    ms_ip = spark.read.parquet(str(cdr_parquet / "ms_ip"))

    def _src_row(cdr_id):
        return spark.sql(
            f"""SELECT CAST('2024-01-01 00:00:00' AS TIMESTAMP) AS start_time,
                       'mo-probe' AS measuring_probe_name,
                       CAST({new_imsi} AS BIGINT) AS imsi,
                       CAST(NULL AS BIGINT) AS msisdn,
                       ';10.0.0.1;' AS ms_ip_address,
                       CAST({cdr_id} AS BIGINT) AS unique_cdr_id"""
        )

    _src_row(1).write.mode("append").parquet(str(src_dir))

    now = [0.0]
    collected: list[tuple[int, int | None]] = []  # (unique_cdr_id, msisdn)

    def write_fn(df, batch_id):
        collected.extend(
            (r.unique_cdr_id, r.msisdn)
            for r in df.select("unique_cdr_id", "msisdn").collect()
        )

    fn = refreshing_enrichment_batch_fn(
        lambda: spark.read.parquet(str(dim_dir)),
        lambda: ms_ip,
        write_fn,
        ttl_seconds=60.0,
        path_a_how="left",  # unmatched imsi emits with NULL msisdn
        clock_fn=lambda: now[0],
    )
    q = (
        file_stream(spark, str(src_dir))
        .writeStream.foreachBatch(fn)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:

        def _wait_for(pred, timeout=120):
            deadline = _time.time() + timeout
            while _time.time() < deadline:
                if pred():
                    return
                _time.sleep(0.5)
            raise AssertionError(f"timed out; collected={collected}")

        _wait_for(lambda: (1, None) in collected)

        # dim UPDATE lands while the query runs; TTL not yet expired —
        # the next batch must keep serving the cached generation
        spark.createDataFrame(
            [(new_imsi, new_msisdn)], "imsi bigint, msisdn bigint"
        ).write.mode("append").parquet(str(dim_dir))
        _src_row(2).write.mode("append").parquet(str(src_dir))
        _wait_for(lambda: (2, None) in collected)
        assert fn.imsi_dim.refresh_count == 1  # inside TTL: no reload

        # clock passes the TTL → the update becomes visible to the
        # SAME running query
        now[0] = 61.0
        _src_row(3).write.mode("append").parquet(str(src_dir))
        _wait_for(lambda: (3, new_msisdn) in collected)
        assert fn.imsi_dim.refresh_count == 2
        assert (3, None) not in collected
    finally:
        q.stop()
