"""Contracts for operators/nndescent.py (the claims its docstrings
make, pinned): the Arrow pair scorer is bit-identical to the JVM
cosine fold, the graph is byte-deterministic under repartitioning,
recall >= 0.9 on clustered corpora vs the exact graph, and the
convergence profile behaves (mean kept cosine non-decreasing,
new-edge count collapsing toward 0)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_application_spark.operators.nndescent import (
    knn_graph_exact,
    nn_descent,
    nn_descent_profile,
    pair_cosine_arrow,
)


def _emb(spark, sf_dir):
    from flink_application_spark.catalog import register_views

    return register_views(spark, sf_dir, tables=("embeddings",))[
        "embeddings"
    ].filter(F.col("embedding").isNotNull())


def _clustered_corpus(spark, n_clusters=10, per_cluster=40, dim=16, seed=5):
    """Synthetic corpus WITH cluster structure (same rationale as
    tests/test_ivf.py: the driver embeddings are isotropic random, so
    high-recall contracts only make sense where neighbors concentrate
    — the regime graph-ANN exists for)."""
    from pyspark.sql.types import (
        ArrayType,
        FloatType,
        LongType,
        StructField,
        StructType,
    )

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 5.0
    rows = []
    for c in range(n_clusters):
        pts = centers[c] + rng.normal(size=(per_cluster, dim))
        rows += [
            (c * per_cluster + i, pts[i].astype(np.float32).tolist())
            for i in range(per_cluster)
        ]
    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(FloatType())),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_pair_scorer_bit_identical_to_jvm_fold(spark, sf_dir):
    """pair_cosine_arrow == functions.vectors.cosine (the JVM
    zip_with/aggregate fold) EXACTLY — same left-to-right float64
    accumulation — on real driver pairs; NULL and length-mismatched
    pairs yield NULL on both paths."""
    from flink_application_spark.functions.vectors import cosine

    emb = _emb(spark, sf_dir)
    a = emb.filter(F.col("vec_id") < 12).select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va")
    )
    b = emb.filter((F.col("vec_id") >= 12) & (F.col("vec_id") < 24)).select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb")
    )
    pairs = a.crossJoin(b)
    got = pairs.select(
        "id_a",
        "id_b",
        pair_cosine_arrow(F.col("va"), F.col("vb")).alias("arrow_cos"),
        cosine(F.col("va"), F.col("vb")).alias("fold_cos"),
    ).collect()
    assert len(got) == 144
    for r in got:
        # bit-identical, not approximately equal
        assert r.arrow_cos == r.fold_cos, (r.id_a, r.id_b)

    # NULL / dim-mismatch rows → NULL (and mixed-dim batches still
    # score the valid same-dim groups)
    mixed = spark.createDataFrame(
        [
            (1, [1.0, 0.0], [1.0, 0.0]),
            (2, None, [1.0, 0.0]),
            (3, [1.0, 0.0], [1.0, 0.0, 0.0]),
            (4, [0.0, 1.0, 0.0], [0.0, 1.0, 0.0]),
        ],
        "id long, va array<float>, vb array<float>",
    )
    rows = {
        r.id: r.c
        for r in mixed.select(
            "id", pair_cosine_arrow(F.col("va"), F.col("vb")).alias("c")
        ).collect()
    }
    assert rows[1] == pytest.approx(1.0)
    assert rows[2] is None
    assert rows[3] is None
    assert rows[4] == pytest.approx(1.0)


def test_graph_byte_deterministic_under_repartitioning(spark, sf_dir):
    """Same corpus, different physical partitioning → the SAME graph,
    row for row (the ring init, tie-breaks, and set-algebra candidate
    generation are all partitioning-independent)."""
    emb = _emb(spark, sf_dir)
    g1 = nn_descent(emb, k=4, n_iter=2)
    g2 = nn_descent(emb.repartition(7, "vec_id"), k=4, n_iter=2)
    rows1 = sorted(tuple(r) for r in g1.collect())
    rows2 = sorted(tuple(r) for r in g2.collect())
    assert rows1 == rows2
    # exactly k edges per vertex, rank 1..k
    n = emb.count()
    assert len(rows1) == n * 4


def test_recall_on_clustered_corpus(spark):
    """>= 0.9 edge recall vs the exact graph after a few rounds on
    clustered data — the regime the operator exists for (the driver's
    isotropic embeddings are the documented hard floor, published by
    the emb_knn_graph_recall registry entry instead).

    k matters (WWW'11 §5): recall rises with k because a larger kept
    set keeps more bridge edges alive for the local join. Measured on
    this corpus: k=6 plateaus ~0.5 (converged local optimum, fine
    per-round behavior), k=10 reaches 1.0 by round 6 — so the >= 0.9
    contract is pinned at k=10, the honest operating point, not at a
    k where the algorithm is known-degraded."""
    emb = _clustered_corpus(spark)
    k = 10
    exact = {
        (r.vec_id, r.nbr_id) for r in knn_graph_exact(emb, k=k).collect()
    }
    approx = {
        (r.vec_id, r.nbr_id)
        for r in nn_descent(emb, k=k, n_iter=6).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"recall {recall:.3f} too low"


def test_convergence_profile(spark, sf_dir):
    """Per-round profile: mean kept cosine is non-decreasing (kept
    sets only improve) and the new-edge count collapses over rounds
    (the WWW'11 termination signal)."""
    emb = _emb(spark, sf_dir)
    prof = nn_descent_profile(emb, spark, k=6, n_iter=3).orderBy(
        "iteration"
    ).collect()
    assert [r.iteration for r in prof] == [1, 2, 3]
    for earlier, later in zip(prof, prof[1:]):
        assert later.mean_cosine >= earlier.mean_cosine
    assert prof[-1].new_edges < prof[0].new_edges
    assert all(r.new_edges >= 0 for r in prof)


def test_rescored_pairs_never_regenerate(spark, sf_dir):
    """The anti-join excludes ALL ever-scored pairs, not just pairs
    currently in the graph (the WWW'11 new/old-flag role): a pair
    scored and rejected in round 1 must not be re-scored in round 2.
    Pinned by counting Arrow-scored pairs via an instrumented run."""
    import flink_application_spark.operators.nndescent as nd

    emb = _emb(spark, sf_dir).filter(F.col("vec_id") < 60)
    seen: list[set] = [set()]
    orig = nd._score_pairs

    def spy(pairs, e, id_col, vec_col):
        batch = {
            (r.id_a, r.id_b) if r.id_a < r.id_b else (r.id_b, r.id_a)
            for r in pairs.select("id_a", "id_b").collect()
        }
        dup = batch & seen[0]
        assert not dup, f"re-scored pairs: {sorted(dup)[:5]}"
        seen[0] |= batch
        return orig(pairs, e, id_col, vec_col)

    nd._score_pairs = spy
    try:
        nn_descent(emb, k=4, n_iter=3)
    finally:
        nd._score_pairs = orig
    assert seen[0]  # the spy actually observed scoring work
