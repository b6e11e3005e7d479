"""Dynamic rule engine (broadcast-state pattern): rule updates between
triggers take effect on the next batch; each batch's matches reflect
the rules CURRENT at its processing time; replay converges."""

from __future__ import annotations

import pytest as _pytest_tier

# slow tier: e2e streaming / stateful-store / property tests (round-8
# verdict item 8). Default runs exclude these via pytest.ini addopts;
# run the full suite with:  python -m pytest tests/ -q -m ''
pytestmark = _pytest_tier.mark.slow

from pyspark.sql import functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.sources.streams import file_stream
from flink_application_spark.streaming.dynamic_rules import (
    DynamicRuleEngine,
    write_rules,
)


def _run_wave(spark, src, engine, ckpt):
    q = engine.attach(
        file_stream(spark, str(src), max_files_per_trigger=10),
        checkpoint=str(ckpt),
    )
    q.awaitTermination(300)


def test_rules_change_between_waves(spark, sf_dir, tmp_path):
    ev = register_views(spark, sf_dir, tables=("events",))["events"].select(
        "event_id", "event_type", "value", "user_id"
    )
    w1 = ev.filter(F.col("event_id") % 2 == 0).cache()
    w2 = ev.filter(F.col("event_id") % 2 == 1).cache()
    src = tmp_path / "in"
    rules_path = str(tmp_path / "rules.json")
    engine = DynamicRuleEngine(rules_path, str(tmp_path / "out"), id_col="event_id")

    # epoch 1: one rule live
    write_rules({"big_value": "value > 200"}, rules_path)
    w1.coalesce(1).write.mode("append").parquet(str(src))
    _run_wave(spark, src, engine, tmp_path / "ckpt")
    m1 = engine.matches(spark)
    assert {r["rule_id"] for r in m1.select("rule_id").distinct().collect()} == {
        "big_value"
    }
    want1 = {r["event_id"] for r in w1.filter("value > 200").collect()}
    assert {r["event_id"] for r in m1.collect()} == want1

    # epoch 2: rule set REPLACED mid-stream (broadcast-state update)
    write_rules(
        {"purchases": "event_type = 'purchase'", "tiny": "value < 1.0"},
        rules_path,
    )
    w2.coalesce(1).write.mode("append").parquet(str(src))
    _run_wave(spark, src, engine, tmp_path / "ckpt")

    all_matches = engine.matches(spark).collect()
    got_by_rule: dict = {}
    for r in all_matches:
        got_by_rule.setdefault(r["rule_id"], set()).add(r["event_id"])
    # wave-1 matches are untouched history; wave 2 matched ONLY new rules
    assert got_by_rule["big_value"] == want1
    assert got_by_rule.get("purchases", set()) == {
        r["event_id"] for r in w2.filter("event_type = 'purchase'").collect()
    }
    assert got_by_rule.get("tiny", set()) == {
        r["event_id"] for r in w2.filter("value < 1.0").collect()
    }
    w1.unpersist()
    w2.unpersist()


def test_rule_replay_converges(spark, sf_dir, tmp_path):
    ev = register_views(spark, sf_dir, tables=("events",))["events"].select(
        "event_id", "event_type", "value"
    )
    rules_path = str(tmp_path / "rules.json")
    write_rules({"clicks": "event_type = 'click'"}, rules_path)
    engine = DynamicRuleEngine(rules_path, str(tmp_path / "out"), id_col="event_id")
    batch = ev.limit(500)
    engine.process_batch(batch, 0)
    before = sorted(r["event_id"] for r in engine.matches(spark).collect())
    engine.process_batch(batch, 0)
    after = sorted(r["event_id"] for r in engine.matches(spark).collect())
    assert after == before and len(before) > 0


def test_empty_rule_batch_schema_matches_typed_id(spark, tmp_path):
    """An empty-rule batch followed by a matching batch must produce ONE
    readable matches() store even for a non-bigint id column (round-2
    advice: the empty frame hardcoded bigint)."""
    from flink_application_spark.streaming.dynamic_rules import (
        DynamicRuleEngine,
        write_rules,
    )

    rules_path = str(tmp_path / "rules.json")
    eng = DynamicRuleEngine(rules_path, str(tmp_path / "out"), id_col="sid")
    batch = spark.createDataFrame(
        [("a", 5), ("b", 50)], "sid string, v int"
    )
    eng.process_batch(batch, 0)  # no rules yet → typed empty write
    write_rules({"big": "v > 10"}, rules_path)
    eng.process_batch(batch, 1)
    got = eng.matches(spark)
    assert dict(got.dtypes)["sid"] == "string"
    assert {r["sid"] for r in got.collect()} == {"b"}
