"""Quality-classifier TRAINING queries — softmax logistic regression
fit by distributed full-batch GD over the `embeddings` table
(`operators/lr.py`), closing the loop that `classifier_queries.py`
scores: real curation pipelines (CCNet, fastText quality filters)
train the linear model on labeled seeds, then apply it corpus-wide.

Rows-only at the driver gate, by necessity: like Lloyd's means
(`clustering_queries` docstring), the cross-partition float gradient
partials are not bit-reproducible in SQL — `tests/test_lr.py` pins a
bit-exact numpy-reference parity on one partition and close agreement
on many, which is strictly stronger evidence than a value hash.

Reference capability anchor: the reference app's enrichment chain is
"model"-as-config applied per record (EnrichmentApp.java lookup maps);
here the model is LEARNED from data, then applied with the same
scan-local discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.plans.registry import register

_CLASSES = 10
_DIM = 64
_ITERS = 15
# step tuned on the unit-norm fixture embeddings (coord std ≈ 1/8, so
# raw gradients are small): 2.0 barely moves the loss in 15 iters,
# 20.0 overshoots into a 2-cycle (regularized loss oscillates up on
# alternate iterations), 16.0 is the largest tested step with strictly
# monotone descent at sf0.001/0.01/0.1. The fixture's labels are only
# weakly linear in the embeddings (1-NN label agreement ≈ chance), so
# the curve ends well short of separation — which is exactly what the
# profile is FOR: it shows how much signal the classifier actually
# found before anyone trusts the filter corpus-wide.
_STEP = 16.0
_L2 = 1e-3


def _fit(spark: SparkSession, sf_dir: str):
    from flink_application_spark.operators.lr import softmax_lr_fit

    emb = register_views(spark, sf_dir, tables=("embeddings",))["embeddings"]
    return emb, softmax_lr_fit(
        emb,
        n_classes=_CLASSES,
        dim=_DIM,
        iters=_ITERS,
        step=_STEP,
        l2=_L2,
    )


@register(
    "emb_lr_train_profile",
    None,  # GD gradient partials are distributed float aggs — not bit-reproducible in SQL
    doc=f"Softmax logistic-regression training profile (C={_CLASSES}, "
    f"d={_DIM}, {_ITERS} full-batch GD iterations, zero init, no RNG): "
    "one shuffle-free Arrow pass per iteration — each partition emits "
    "one C×(d+1) gradient partial, the driver folds ~partitions rows "
    "and updates. Output is the per-iteration (mean regularized NLL, "
    "train accuracy) curve: loss must fall from ln C and accuracy "
    "must rise off the majority baseline, the convergence evidence a "
    "pipeline checks before trusting the trained filter. Semantics "
    "pinned against a numpy reference in tests/test_lr.py.",
    tags=("embeddings", "classifier", "training"),
)
def q_lr_train_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, (_, _, history) = _fit(spark, sf_dir)
    rows = [(it, round(loss, 6), round(acc, 6)) for it, loss, acc in history]
    return spark.createDataFrame(
        rows, "iter int, mean_nll double, train_acc double"
    )


@register(
    "emb_lr_holdout_eval",
    None,  # trained weights are data-dependent (see emb_lr_train_profile)
    doc="Train/holdout accuracy of the softmax classifier under an "
    "md5-keyed 80/20 split (retry-safe, source-unbiased — doc_id "
    "parity slices are biased on this generator): train on the 80% "
    "side, score BOTH sides with one scan-local argmax pass, report "
    "(split, n, accuracy). The train-vs-holdout gap is the "
    "overfitting check a pipeline runs before trusting a trained "
    "quality filter corpus-wide — on this fixture's near-random "
    "labels the gap IS the finding (train accuracy is memorization; "
    "holdout sits at chance).",
    tags=("embeddings", "classifier", "training", "eval"),
)
def q_lr_holdout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.lr import lr_predictions, softmax_lr_fit

    emb = register_views(spark, sf_dir, tables=("embeddings",))["embeddings"]
    cell = F.conv(F.substring(F.md5(F.col("vec_id").cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % 5
    emb = emb.withColumn("split", F.when(cell == 0, F.lit("holdout")).otherwise(F.lit("train")))
    w, b, _ = softmax_lr_fit(
        emb.filter(F.col("split") == "train"),
        n_classes=_CLASSES,
        dim=_DIM,
        iters=_ITERS,
        step=_STEP,
        l2=_L2,
    )
    # split rides the scoring pass (passthrough) — no id-keyed re-join
    scored = lr_predictions(emb, w, b, passthrough=("split",))
    return scored.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg((F.col("pred") == F.col("label")).cast("double")), 6).alias(
            "accuracy"
        ),
    )


@register(
    "emb_lr_confusion",
    None,  # trained weights are data-dependent (see emb_lr_train_profile)
    doc="Confusion matrix of the trained softmax classifier on its "
    "training set: scan-local argmax scoring under the learned C×d "
    "weights (one Arrow pass, embeddings never shuffle), then one "
    "hash agg over (label, pred) — at most C² result rows at any "
    "corpus size. The per-class error structure is what decides "
    "whether a quality filter is safe to apply corpus-wide.",
    tags=("embeddings", "classifier", "training", "eval"),
)
def q_lr_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.lr import lr_predictions

    emb, (w, b, _) = _fit(spark, sf_dir)
    return (
        lr_predictions(emb, w, b)
        .groupBy("label", "pred")
        .agg(F.count(F.lit(1)).alias("n"))
    )
