"""Distributed softmax-LR training (`operators/lr.py`): the gradient
pass must be EXACTLY the numpy reference math (bit-equal on one
partition, where Spark's partial fold degenerates to the same single
float64 op sequence), close on many partitions (summation-order ulps
only), and the registered profile must show monotone full-batch GD
descent — the convergence evidence the query exists to expose."""

from __future__ import annotations

import numpy as np
import pytest

from flink_application_spark.operators.lr import lr_predictions, softmax_lr_fit

_SF = "/root/testdata/sf0.001"
_C, _D = 10, 64


def _xy(spark):
    from flink_application_spark.catalog import register_views

    emb = register_views(spark, _SF, tables=("embeddings",))["embeddings"]
    emb = emb.filter("embedding IS NOT NULL AND label IS NOT NULL")
    rows = emb.select("vec_id", "embedding", "label").orderBy("vec_id").collect()
    x = np.asarray([r["embedding"] for r in rows], dtype=np.float64)
    y = np.asarray([r["label"] for r in rows], dtype=np.int64)
    return emb, x, y


def _reference_fit(x, y, iters, step, l2):
    w = np.zeros((_C, _D))
    b = np.zeros(_C)
    hist = []
    for it in range(iters):
        z = x @ w.T + b
        z -= z.max(axis=1, keepdims=True)
        e = np.exp(z)
        p = e / e.sum(axis=1, keepdims=True)
        rows = np.arange(len(y))
        loss = float(-np.log(p[rows, y]).mean()) + 0.5 * l2 * float((w * w).sum())
        acc = float((p.argmax(axis=1) == y).mean())
        hist.append((it, loss, acc))
        p[rows, y] -= 1.0
        w = w - step * ((p.T @ x) / len(y) + l2 * w)
        b = b - step * (p.sum(axis=0) / len(y))
    return w, b, hist


def test_single_partition_matches_numpy_reference(spark):
    """On ONE partition (sorted rows) the distributed pass runs the
    same float64 formula as the reference. Equality is to ~1 ulp, not
    bit-exact: `x @ w.T` goes through BLAS, whose dot-product
    summation order depends on thread count — executor-side numpy and
    driver-side numpy may legally differ in the last bit (this is the
    float-path limitation the exact-integer twin `operators/
    lr_exact.py` exists to remove)."""
    emb, x, y = _xy(spark)
    one = emb.orderBy("vec_id").coalesce(1)
    w, b, hist = softmax_lr_fit(one, n_classes=_C, dim=_D, iters=5, step=16.0, l2=1e-3)
    rw, rb, rhist = _reference_fit(x, y, iters=5, step=16.0, l2=1e-3)
    assert np.allclose(w, rw, rtol=1e-12, atol=1e-15)
    assert np.allclose(b, rb, rtol=1e-12, atol=1e-15)
    for (i, l, a), (ri, rl, ra) in zip(hist, rhist):
        assert i == ri and a == pytest.approx(ra, abs=1e-9)
        assert l == pytest.approx(rl, rel=1e-12)


def test_multi_partition_close_to_reference(spark):
    """Across 32 partitions only float summation order differs —
    weights must agree to tight tolerance after 10 iterations."""
    emb, x, y = _xy(spark)
    many = emb.repartition(32)
    w, b, _ = softmax_lr_fit(many, n_classes=_C, dim=_D, iters=10, step=16.0, l2=1e-3)
    rw, rb, _ = _reference_fit(x, y, iters=10, step=16.0, l2=1e-3)
    assert np.allclose(w, rw, rtol=1e-9, atol=1e-12)
    assert np.allclose(b, rb, rtol=1e-9, atol=1e-12)


def test_profile_descends_and_learns(spark):
    """Full-batch GD on a smooth convex loss with a working step must
    descend monotonically; accuracy must end above the zero-init
    baseline (argmax ties resolve to class 0 at init)."""
    emb, _, _ = _xy(spark)
    _, _, hist = softmax_lr_fit(emb, n_classes=_C, dim=_D, iters=15, step=16.0, l2=1e-3)
    losses = [l for _, l, _ in hist]
    assert losses[0] == pytest.approx(np.log(_C), abs=1e-9)  # ln C at zero init
    assert all(a > b for a, b in zip(losses, losses[1:]))  # strict descent
    assert hist[-1][2] > hist[0][2]  # accuracy moved off the baseline


def test_gradient_matches_finite_differences():
    """The softmax-NLL gradient formula itself (p − onehot, the math
    both the Spark pass and the reference implement) must agree with
    central finite differences — this breaks the circularity of
    pinning Spark against a reference that shares its formula.
    Pure numpy, no Spark session."""
    rng = np.random.default_rng(7)
    n, c, d = 12, 3, 4
    x = rng.normal(size=(n, d))
    y = rng.integers(0, c, size=n)
    w = rng.normal(scale=0.3, size=(c, d))
    b = rng.normal(scale=0.3, size=c)

    def loss(w_, b_):
        z = x @ w_.T + b_
        z = z - z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        return float(-np.log(p[np.arange(n), y]).sum())

    z = x @ w.T + b
    z -= z.max(axis=1, keepdims=True)
    p = np.exp(z)
    p /= p.sum(axis=1, keepdims=True)
    p[np.arange(n), y] -= 1.0
    g_w = p.T @ x
    g_b = p.sum(axis=0)

    eps = 1e-6
    for idx in [(0, 0), (1, 2), (2, 3)]:
        wp = w.copy(); wp[idx] += eps
        wm = w.copy(); wm[idx] -= eps
        fd = (loss(wp, b) - loss(wm, b)) / (2 * eps)
        assert abs(fd - g_w[idx]) < 1e-5, (idx, fd, g_w[idx])
    for j in range(c):
        bp = b.copy(); bp[j] += eps
        bm = b.copy(); bm[j] -= eps
        fd = (loss(w, bp) - loss(w, bm)) / (2 * eps)
        assert abs(fd - g_b[j]) < 1e-5, (j, fd, g_b[j])


def test_l2_shrinks_weights(spark):
    emb, _, _ = _xy(spark)
    w_lo, _, _ = softmax_lr_fit(emb, n_classes=_C, dim=_D, iters=10, step=16.0, l2=1e-4)
    w_hi, _, _ = softmax_lr_fit(emb, n_classes=_C, dim=_D, iters=10, step=16.0, l2=1e-1)
    assert np.linalg.norm(w_hi) < np.linalg.norm(w_lo)


def test_holdout_eval_exposes_memorization(spark):
    """The fixture's labels are ~independent of the embeddings, so the
    registered holdout query (round 8: the exact-integer ridge
    trainer, `operators/lr_exact.py`) must show the classic overfit
    signature: train accuracy well above chance (650 params memorizing
    ~400 rows), holdout at chance. Deterministic: md5 split, zero
    init, fixed iterations — no RNG anywhere."""
    from flink_application_spark.plans.registry import REGISTRY_GET

    rows = {
        r["split"]: r
        for r in REGISTRY_GET("emb_lr_holdout_eval").spark(spark, _SF).collect()
    }
    assert set(rows) == {"train", "holdout"}
    assert rows["train"]["n"] + rows["holdout"]["n"] == 500
    assert rows["train"]["accuracy"] > rows["holdout"]["accuracy"] + 0.1
    assert rows["holdout"]["accuracy"] < 0.2  # chance-level on random labels


def test_predictions_match_reference_argmax(spark):
    emb, x, y = _xy(spark)
    w, b, _ = softmax_lr_fit(emb, n_classes=_C, dim=_D, iters=5, step=16.0, l2=1e-3)
    got = {
        r["vec_id"]: r["pred"]
        for r in lr_predictions(emb, w, b).collect()
    }
    ids = [r["vec_id"] for r in emb.select("vec_id").orderBy("vec_id").collect()]
    want = (x @ w.T + b).argmax(axis=1)
    assert got == {i: int(p) for i, p in zip(ids, want)}
    # confusion-matrix query invariant: total count == corpus rows
    assert sum(1 for _ in got) == len(y)
