"""Repeated n-gram scrub: synthetic-edge-case semantics (the parity
test covers the corpus; this pins short docs, full removal, and
order preservation)."""

from __future__ import annotations

from flink_application_spark.plans.scrub_queries import repeated_ngram_scrub


def _run(spark, rows, n=4, t=2):
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["scrubbed_text"])
        for r in repeated_ngram_scrub(df, n=n, t=t).collect()
    }


def test_boilerplate_removed_order_preserved(spark):
    boiler = "all rights reserved contact us here"  # 6 tokens
    got = _run(
        spark,
        [
            (1, f"alpha beta {boiler} gamma"),
            (2, f"delta {boiler} epsilon zeta"),
            (3, "unrelated words entirely different content here today"),
        ],
        n=4,
        t=2,
    )
    # every 4-gram inside `boiler` occurs in docs 1 and 2 → covered
    assert got[1] == (9, 3, "alpha beta gamma")
    assert got[2] == (9, 3, "delta epsilon zeta")
    assert got[3][1] == got[3][0]  # untouched


def test_short_doc_is_identity(spark):
    got = _run(spark, [(1, "a b c"), (2, "a b c"), (3, "a b c")], n=4, t=2)
    assert got[1] == (3, 3, "a b c")  # shorter than n: no grams, no removal


def test_full_removal_yields_empty_text(spark):
    same = "x y z w"
    got = _run(spark, [(1, same), (2, same)], n=4, t=2)
    assert got[1] == (4, 0, "")
    assert got[2] == (4, 0, "")
