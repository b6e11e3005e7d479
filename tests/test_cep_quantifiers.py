"""Kleene-plus (oneOrMore, greedy) CEP semantics — hand-verified
sequences covering extension, greedy disambiguation, rewind, and the
trailing-plus rejection."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from flink_application_spark.operators.cep import greedy_scan_quant, match_pattern

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, k, T0 + dt.timedelta(seconds=s), t) for i, (k, s, t) in enumerate(rows)],
        "event_id: long, user_id: long, ts: timestamp_ntz, event_type: string",
    )


def _steps(*types):
    return [F.col("event_type") == t for t in types]


def _rows(df):
    cols = sorted(c for c in df.columns if c != "key")
    return sorted(tuple([r["key"]] + [r[c] for c in cols]) for r in df.collect())


def test_plus_absorbs_repetitions(spark):
    # a b b b c → B+ binds 3 events
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "b"), (1, 3, "b"), (1, 4, "c")]
    out = match_pattern(
        _ev(spark, rows), "user_id", "ts", _steps("a", "b", "c"),
        id_col="event_id", quantifiers=["once", "oneOrMore", "once"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["step_1_n"], r["step_2_n"], r["step_3_n"]) == (1, 3, 1)
    assert r["step_2_id"] == 1  # first bound event of the plus


def test_greedy_prefers_extension_over_advance(spark):
    # event 2 matches BOTH b and c (type 'bc' → both predicates true):
    # greedy keeps extending B+, so C binds the LATER pure-c event
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "bc"), (1, 3, "c")]
    steps = [
        F.col("event_type") == "a",
        F.col("event_type").isin("b", "bc"),
        F.col("event_type").isin("c", "bc"),
    ]
    out = match_pattern(
        _ev(spark, rows), "user_id", "ts", steps,
        id_col="event_id", quantifiers=["once", "oneOrMore", "once"],
    ).collect()
    assert len(out) == 1
    assert out[0]["step_2_n"] == 2  # b and bc both absorbed
    assert out[0]["step_3_id"] == 3


def test_within_expiry_rewind_with_plus(spark):
    # head a@0 too old for c@15 under within=10; rebind from a@5
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 5, "a"), (1, 6, "b"), (1, 15, "c")]
    out = match_pattern(
        _ev(spark, rows), "user_id", "ts", _steps("a", "b", "c"),
        id_col="event_id", within_seconds=10,
        quantifiers=["once", "oneOrMore", "once"],
    ).collect()
    assert len(out) == 1
    assert out[0]["step_1_id"] == 2 and out[0]["step_3_id"] == 4


def test_non_overlap_with_plus(spark):
    rows = [
        (1, 0, "a"), (1, 1, "b"), (1, 2, "c"),
        (1, 3, "a"), (1, 4, "b"), (1, 5, "b"), (1, 6, "c"),
    ]
    out = match_pattern(
        _ev(spark, rows), "user_id", "ts", _steps("a", "b", "c"),
        id_col="event_id", quantifiers=["once", "oneOrMore", "once"],
    ).collect()
    assert sorted(r["step_2_n"] for r in out) == [1, 2]


def test_trailing_plus_rejected(spark):
    with pytest.raises(ValueError, match="final step"):
        match_pattern(
            _ev(spark, [(1, 0, "a")]), "user_id", "ts", _steps("a", "b"),
            quantifiers=["once", "oneOrMore"],
        )


def test_quant_core_once_only_equals_plain_scan():
    from flink_application_spark.operators.cep import greedy_scan

    ts = [0, 1, 2, 3, 4, 5]
    flags = [
        [True, False, False, True, False, False],
        [False, True, False, False, True, False],
        [False, False, True, False, False, True],
    ]
    plain, _, _ = greedy_scan(ts, flags, 3, None, [], 0, 6)
    quant, _, _ = greedy_scan_quant(ts, flags, ["once"] * 3, None, [], 0, 6)
    assert [[p[0] for p in m] for m in quant] == plain


def test_not_between_kills_partial(spark):
    # a X b: error X between kills; later clean a b matches
    rows = [(1, 0, "a"), (1, 1, "x"), (1, 2, "b"), (1, 3, "a"), (1, 4, "b")]
    out = match_pattern(
        _ev(spark, rows), "user_id", "ts", _steps("a", "b"),
        id_col="event_id", not_between=[F.col("event_type") == "x"],
    ).collect()
    assert len(out) == 1
    assert (out[0]["step_1_id"], out[0]["step_2_id"]) == (3, 4)


def test_not_between_reseek_finds_inner_match(spark):
    # a1 a2 X b: the partial headed at a1 dies at X... but so does one
    # headed at a2 (X is between a2 and b too). A clean pair after X
    # matches.
    rows = [(1, 0, "a"), (1, 1, "a"), (1, 2, "x"), (1, 3, "b"), (1, 4, "a"), (1, 5, "b")]
    out = match_pattern(
        _ev(spark, rows), "user_id", "ts", _steps("a", "b"),
        id_col="event_id", not_between=[F.col("event_type") == "x"],
    ).collect()
    assert len(out) == 1
    assert (out[0]["step_1_id"], out[0]["step_2_id"]) == (4, 5)


def test_completion_beats_guard(spark):
    # an event matching BOTH the final step and the guard completes
    rows = [(1, 0, "a"), (1, 1, "bx")]
    steps = [F.col("event_type") == "a", F.col("event_type").isin("b", "bx")]
    out = match_pattern(
        _ev(spark, rows), "user_id", "ts", steps,
        id_col="event_id",
        not_between=[F.col("event_type").isin("x", "bx")],
    ).collect()
    assert len(out) == 1


def test_guard_between_plus_repetitions(spark):
    # guard on gap 2 (between B+ and C); killer between b-burst and c
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "b"), (1, 3, "x"), (1, 4, "c"),
            (1, 5, "a"), (1, 6, "b"), (1, 7, "c")]
    out = match_pattern(
        _ev(spark, rows), "user_id", "ts", _steps("a", "b", "c"),
        id_col="event_id", quantifiers=["once", "oneOrMore", "once"],
        not_between=[None, F.col("event_type") == "x"],
    ).collect()
    assert len(out) == 1
    assert (out[0]["step_1_id"], out[0]["step_3_id"]) == (5, 7)
