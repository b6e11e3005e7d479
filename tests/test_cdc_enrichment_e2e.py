"""End-to-end CDC-fed enrichment: a Debezium changelog maintains a
LIVE dimension (upsert view), and a second stream of events enriches
against whatever snapshot is current — the reference's lookup-join
with a dimension that actually changes mid-stream (EnrichmentApp's
JDBC dim + partial-cache TTL, realized as changelog → snapshot →
stream-static join).

Wave plan:
  epoch 1: dim = {1: gold, 2: silver};  events e1..e3 enrich against it
  epoch 2: CDC updates 1→platinum, deletes 2, inserts 3→bronze;
           events e4..e6 enrich against the NEW snapshot
Assertions: per-epoch enrichment used the epoch's dim exactly
(update visible, delete → NULL tier, insert visible)."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

import json

from pyspark.sql import functions as F

from flink_application_spark.sources.debezium import decode_debezium
from flink_application_spark.streaming.upsert_view import UpsertView


def _envelope(op, before, after, ts_ms):
    return json.dumps(
        {"op": op, "ts_ms": ts_ms, "before": before, "after": after}
    )


def _apply_cdc(spark, view, lines, batch_id):
    raw = spark.createDataFrame([(x,) for x in lines], "value string")
    changelog = decode_debezium(raw, "cust_id BIGINT, tier STRING")
    view.process_batch(changelog, batch_id)


def test_cdc_dim_feeds_enrichment(spark, tmp_path):
    view = UpsertView(str(tmp_path / "dim"), key_cols=["cust_id"], seq_col="seq")

    # epoch 1: snapshot creates
    _apply_cdc(
        spark,
        view,
        [
            _envelope("r", None, {"cust_id": 1, "tier": "gold"}, 1000),
            _envelope("r", None, {"cust_id": 2, "tier": "silver"}, 1000),
        ],
        0,
    )
    dim1 = view.snapshot(spark)
    events1 = spark.createDataFrame(
        [(101, 1), (102, 2), (103, 9)], "event_id long, cust_id long"
    )
    got1 = {
        r["event_id"]: r["tier"]
        for r in events1.join(F.broadcast(dim1), "cust_id", "left").collect()
    }
    assert got1 == {101: "gold", 102: "silver", 103: None}

    # epoch 2: update / delete / insert arrive as CDC
    _apply_cdc(
        spark,
        view,
        [
            _envelope(
                "u",
                {"cust_id": 1, "tier": "gold"},
                {"cust_id": 1, "tier": "platinum"},
                2000,
            ),
            _envelope("d", {"cust_id": 2, "tier": "silver"}, None, 2100),
            _envelope("c", None, {"cust_id": 3, "tier": "bronze"}, 2200),
        ],
        1,
    )
    dim2 = view.snapshot(spark)
    events2 = spark.createDataFrame(
        [(201, 1), (202, 2), (203, 3)], "event_id long, cust_id long"
    )
    got2 = {
        r["event_id"]: r["tier"]
        for r in events2.join(F.broadcast(dim2), "cust_id", "left").collect()
    }
    assert got2 == {201: "platinum", 202: None, 203: "bronze"}

    # time travel: epoch-1 enrichment is reproducible from version 0
    dim_v0 = view.snapshot(spark, version=0)
    again = {
        r["event_id"]: r["tier"]
        for r in events1.join(F.broadcast(dim_v0), "cust_id", "left").collect()
    }
    assert again == got1
