"""Invariants of the oracle-exact IVF probe-sweep recall curve
(`emb_ivf_recall_curve`): shape, bounds, and monotonicity — growing the
probe set can only add candidates, and anything that displaces an ann
top-k member ranks above it in the SAME total order that defines the
exact top-k, so per-query hits are non-decreasing in n_probe."""

from __future__ import annotations

from flink_application_spark.plans.registry import REGISTRY_GET


def test_recall_curve_shape_and_monotonicity(spark, sf_dir):
    rows = REGISTRY_GET("emb_ivf_recall_curve").spark(spark, sf_dir).collect()
    got = {(r.n_probe, r.query_id): r for r in rows}
    probes = sorted({p for p, _ in got})
    queries = sorted({q for _, q in got})
    assert probes == [1, 2, 3, 4]
    assert len(queries) == 5
    assert len(rows) == 20
    for (p, q), r in got.items():
        assert 0 <= r.n_hits <= 10
        assert r.recall_ppm == r.n_hits * 100_000
    for q in queries:
        hits = [got[(p, q)].n_hits for p in probes]
        assert hits == sorted(hits), f"query {q}: hits not monotone {hits}"
    # probing 1/8 lists must already find something on any corpus where
    # neighbors exist; at least assert the curve is not all-zero
    assert sum(got[(4, q)].n_hits for q in queries) > 0
