"""Changelog-merge semantics on synthetic snapshots (the parity test
covers the derived corpus query; this pins the primitive's edges)."""

from __future__ import annotations

from flink_application_spark.operators.merge import apply_changelog, latest_changes


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k: long, name: string, v: long"
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k: long, seq: long, op: string, name: string, v: long")


def _rows(df):
    return {(r["k"], r["name"], r["v"]) for r in df.collect()}


def test_insert_update_delete(spark):
    ch = _changes(
        spark,
        [
            (2, 1, "U", "b2", 22),       # update existing
            (3, 1, "D", None, None),     # delete existing
            (9, 1, "I", "new", 99),      # insert absent key
        ],
    )
    out = apply_changelog(_snap(spark), ch, ["k"], "seq")
    assert _rows(out) == {(1, "a", 10), (2, "b2", 22), (9, "new", 99)}


def test_last_seq_wins_and_tie_break(spark):
    ch = _changes(
        spark,
        [
            (1, 1, "U", "x", 11),
            (1, 2, "D", None, None),     # later delete wins over update
            (2, 5, "U", "early", 1),
            (2, 7, "U", "late", 2),      # highest seq wins
        ],
    )
    out = apply_changelog(_snap(spark), ch, ["k"], "seq")
    assert _rows(out) == {(2, "late", 2), (3, "c", 30)}


def test_delete_absent_key_is_noop_and_upsert_i(spark):
    ch = _changes(
        spark,
        [
            (42, 1, "D", None, None),    # delete of unknown key: no-op
            (1, 1, "I", "re-ins", 111),  # I on existing key upserts
        ],
    )
    out = apply_changelog(_snap(spark), ch, ["k"], "seq")
    assert _rows(out) == {(1, "re-ins", 111), (2, "b", 20), (3, "c", 30)}


def test_latest_changes_one_row_per_key(spark):
    ch = _changes(spark, [(1, 1, "U", "x", 1), (1, 3, "U", "y", 2), (2, 1, "D", None, None)])
    out = {r["k"]: (r["op"], r["name"]) for r in latest_changes(ch, ["k"], "seq").collect()}
    assert out == {1: ("U", "y"), 2: ("D", None)}
