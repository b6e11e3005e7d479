"""Distributed softmax logistic-regression TRAINING — the missing half
of the quality-classifier stage (`plans/classifier_queries.py` scores a
fixed linear model; real curation pipelines TRAIN that model on labeled
seed sets first — CCNet/fastText-style — then score the corpus).

Spark-first shape, same discipline as `operators/pca.py:gram_long` and
`operators/kmeans.py:kmeans_fit`:

- **One Arrow pass per GD iteration, shuffle-free.** The current
  weights ship to executors inside the `mapInPandas` closure (a
  C×(d+1) float64 block — kilobytes); each Arrow batch emits ONE
  partial row carrying the flattened gradient block, the NLL partial,
  the row count, and the correct-prediction count. The driver collects
  ~numPartitions partial rows and applies the update. Nothing ever
  shuffles; per-iteration network cost is O(partitions × C·d),
  corpus-size-independent — the 1000-executor iteration shape.
- **Full-batch gradient descent, deterministic setup**: zero init, a
  fixed iteration count, no RNG anywhere. Like Lloyd's means
  (`clustering_queries` docstring), the cross-partition float partial
  sums are not bit-reproducible in SQL, so the registered queries are
  rows-only; `tests/test_lr.py` pins bit-exact parity against a numpy
  reference on a single partition (identical float64 op sequence) and
  tolerance parity on many partitions.
- **At 100 TB**: iterations stream over the corpus; state on the
  driver is one C×(d+1) matrix. For datasets where full-batch passes
  are too slow, the uniform-sample discipline already in the repo
  (`kmeans.uniform_sample_rows`) bounds the training set the same way
  FAISS bounds codebook training.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["softmax_lr_fit", "lr_predictions"]


def _one_pass(
    df: DataFrame,
    w: np.ndarray,
    b: np.ndarray,
    *,
    vec_col: str,
    label_col: str,
) -> list:
    """One full pass: per-Arrow-batch partial rows of (flattened
    gradient of the unregularized NLL, NLL sum, row count, correct
    count) under the CURRENT weights. Gradient of softmax NLL:
    gW = (p - onehot).T @ x, gb = column sums of (p - onehot)."""
    n_classes, dim = w.shape
    # capture plain arrays (stable pickles, no accidental views)
    w_c = np.ascontiguousarray(w, dtype=np.float64)
    b_c = np.ascontiguousarray(b, dtype=np.float64)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                dtype=np.float64,
            )
            if x.shape[1] != dim:
                raise ValueError(
                    f"softmax_lr_fit: embedding length {x.shape[1]} != dim={dim}"
                )
            y = pdf[label_col].to_numpy(dtype=np.int64)
            z = x @ w_c.T + b_c  # (n, C)
            z -= z.max(axis=1, keepdims=True)  # stable softmax
            e = np.exp(z)
            p = e / e.sum(axis=1, keepdims=True)
            rows = np.arange(len(y))
            nll = float(-np.log(p[rows, y]).sum())
            correct = int((p.argmax(axis=1) == y).sum())
            p[rows, y] -= 1.0  # p - onehot, in place
            g_w = p.T @ x  # (C, d)
            g_b = p.sum(axis=0)  # (C,)
            yield pd.DataFrame(
                {
                    "g": [np.concatenate([g_w.ravel(), g_b]).tolist()],
                    "nll": [nll],
                    "n": [len(y)],
                    "correct": [correct],
                }
            )

    return df.mapInPandas(
        part, schema="g array<double>, nll double, n bigint, correct bigint"
    ).collect()


def softmax_lr_fit(
    df: DataFrame,
    *,
    n_classes: int,
    dim: int,
    vec_col: str = "embedding",
    label_col: str = "label",
    iters: int = 30,
    step: float = 2.0,
    l2: float = 1e-3,
) -> tuple[np.ndarray, np.ndarray, list[tuple[int, float, float]]]:
    """Train multinomial logistic regression by full-batch GD.

    Returns (W C×d, b C, history) where history rows are
    (iteration, mean regularized NLL, train accuracy) measured under
    the weights BEFORE that iteration's update — iteration 0 is the
    zero-init baseline (mean NLL = ln C, accuracy ≈ the argmax-0
    class share), and the history is the convergence evidence the
    profile query exposes."""
    df = df.filter(df[vec_col].isNotNull() & df[label_col].isNotNull())
    w = np.zeros((n_classes, dim), dtype=np.float64)
    b = np.zeros(n_classes, dtype=np.float64)
    history: list[tuple[int, float, float]] = []
    for it in range(iters):
        partials = _one_pass(df, w, b, vec_col=vec_col, label_col=label_col)
        if not partials:
            raise ValueError("softmax_lr_fit: empty training frame")
        # deterministic driver-side fold: sort partials by their byte
        # image so the float summation order never depends on collect
        # arrival order (run-to-run stability on the same data layout)
        partials = sorted(
            partials, key=lambda r: (r["n"], r["nll"], tuple(r["g"][:4]))
        )
        g = np.zeros(n_classes * dim + n_classes, dtype=np.float64)
        nll = 0.0
        n = 0
        correct = 0
        for r in partials:
            g += np.asarray(r["g"], dtype=np.float64)
            nll += r["nll"]
            n += r["n"]
            correct += r["correct"]
        g_w = g[: n_classes * dim].reshape(n_classes, dim)
        g_b = g[n_classes * dim :]
        loss = nll / n + 0.5 * l2 * float((w * w).sum())
        history.append((it, loss, correct / n))
        w = w - step * (g_w / n + l2 * w)
        b = b - step * (g_b / n)
    return w, b, history


def lr_predictions(
    df: DataFrame,
    w: np.ndarray,
    b: np.ndarray,
    *,
    vec_col: str = "embedding",
    label_col: str = "label",
    id_col: str = "vec_id",
    passthrough: tuple[str, ...] = (),
) -> DataFrame:
    """(id, label, pred, *passthrough): scan-local argmax scoring under
    trained weights — one Arrow pass, embeddings never shuffle.
    Downstream aggregations (confusion matrix, per-split accuracy)
    group kilobyte rows. ``passthrough`` names string columns to carry
    through the pass — cheaper than an id-keyed re-join downstream
    (the scan already has the row; same discipline as
    dedup.segment_rows)."""
    w_c = np.ascontiguousarray(w, dtype=np.float64)
    b_c = np.ascontiguousarray(b, dtype=np.float64)

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]],
                dtype=np.float64,
            )
            z = x @ w_c.T + b_c
            out_cols = {
                id_col: pdf[id_col].to_numpy(dtype=np.int64),
                label_col: pdf[label_col].to_numpy(dtype=np.int64),
                "pred": z.argmax(axis=1).astype(np.int64),
            }
            for c in passthrough:
                out_cols[c] = pdf[c]
            yield pd.DataFrame(out_cols)

    schema = f"{id_col} bigint, {label_col} bigint, pred bigint" + "".join(
        f", {c} string" for c in passthrough
    )
    out = df.filter(df[vec_col].isNotNull() & df[label_col].isNotNull())
    return out.mapInPandas(part, schema=schema)
