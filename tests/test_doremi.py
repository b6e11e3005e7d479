"""DoReMi reweighting invariants: ppm conservation (floor loss only)
and monotonicity of the multiplicative update in the excess signal."""

from __future__ import annotations

from flink_application_spark.catalog import load_table
from flink_application_spark.plans.doremi_queries import doremi_reweight_frame

SF = "/root/testdata/sf0.001"


def test_repetitive_source_gains_weight(spark):
    # srcB repeats one token (unique-token ratio → 0): reads as
    # higher-loss, must be upweighted vs its token share; srcA must
    # lose weight
    rows = [
        (0, "alpha beta gamma delta epsilon zeta", "srcA"),
        (1, "one two three four five six", "srcA"),
        (2, "spam spam spam spam spam spam", "srcB"),
        (3, "ham ham ham ham ham ham", "srcB"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    got = {r["source"]: r for r in doremi_reweight_frame(docs).collect()}
    assert got["srcB"]["w_doremi_ppm"] > got["srcB"]["w_ref_ppm"]
    assert got["srcA"]["w_doremi_ppm"] < got["srcA"]["w_ref_ppm"]


def test_ppm_conservation_and_monotonicity_on_driver_corpus(spark):
    docs = load_table(spark, SF, "documents")
    rows = doremi_reweight_frame(docs).collect()
    n = len(rows)
    total = sum(r["w_doremi_ppm"] for r in rows)
    assert 1_000_000 - n <= total <= 1_000_000  # integer-div floor loss only
    # update ratio w_doremi/w_ref strictly monotone in excess (ties in
    # excess may reorder by floor noise; the driver corpus has none)
    by_excess = sorted(rows, key=lambda r: r["excess"])
    ratios = [r["w_doremi_ppm"] / r["w_ref_ppm"] for r in by_excess]
    for a, b in zip(ratios, ratios[1:]):
        assert b >= a - 1e-3


def test_eta_zero_is_identity(spark):
    docs = load_table(spark, SF, "documents")
    rows = doremi_reweight_frame(docs, eta=0.0).collect()
    for r in rows:
        # exp(0)=1 → raw weight == w_ref_ppm; renormalizing shares of
        # themselves reproduces the reference weights up to floor loss
        assert abs(r["w_doremi_ppm"] - r["w_ref_ppm"]) <= 2
