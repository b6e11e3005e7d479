"""ANN twins of the exact-retrieval queries — the 100 TB-path
registrations (round-2 verdict item 5).

Every exact top-k / k-NN / MMR / triplet / audit query in the registry
keeps its brute-force form as the ORACLE entry (DuckDB can reproduce an
exact ranking bit-for-bit; it cannot reproduce k-means-trained probe
pruning), and gains a `_ann` twin here that runs the SAME downstream
logic over the IVF retriever (`operators/similarity.retrieve_topk(
use_ann=True)`): corpus inverted-listed under trained centroids,
queries probe `n_probe` lists, the scoring join is equi on the list id
— no cross product anywhere. These twins are the entries a 100 TB
deployment runs; the exact forms become explicit oracles/baselines.

Verification split, completed in round 7: every twin here (cosine
top-k, kNN classify, label-noise audit, radius search since round 6;
MMR, triplets, text-search since round 7) runs a DETERMINISTIC
seeded-centroid IVF index at the gate and carries an exact DuckDB
oracle (see `_seeded_cand_cte` below; the greedy MMR unrolls via
plans/mmr_sql.py over integer micro-unit scores). Only
emb_ivf_ann_topk — whose registered POINT is the trained k-means
index — stays rows-only. In all cases the trained-centroid path's agreement
contracts — full probe ≡ exact, and ≥ 0.9 agreement at partial probe
on clustered data — are pinned in tests/test_ivf.py and
tests/test_ann_twins.py. On the driver's
embeddings table specifically, nearest neighbors do NOT concentrate
(isotropic random vectors — measured within-label cosine ≈ cross-label
≈ 0), so partial-probe agreement there is bounded by the probe
fraction for ANY ANN method; the clustered-corpus tests measure the
regime ANN exists for, and the isotropic floor test keeps the honest
bound on the driver data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_application_spark.catalog import register_views
from flink_application_spark.operators.ivf_exact import (
    ivf_exact_trained_oracle_sql,
)
from flink_application_spark.operators.pq_exact import pq_exact_adc_oracle_sql
from flink_application_spark.plans.registry import register

_ANN = dict(n_centroids=16, n_probe=4)

# --- seeded-IVF oracle template ---------------------------------------------
# Round-5 verdict item 3: four of the _ann twins are DETERMINISTIC
# given a deterministic index, so they can carry a real DuckDB oracle
# instead of a rows-only record. The registered entries below run the
# SEEDED IVF index (operators/similarity.ivf_candidates_seeded:
# centroids = embeddings of the k smallest corpus vec_ids, argmin-d2
# assignment, d2-ranked probes — the emb_ivf_recall_curve machinery,
# hash-green since r04) with the identical downstream aggregates; the
# TRAINED-centroid path keeps its pytest recall/agreement contracts
# (tests/test_ivf.py, tests/test_ann_twins.py) and its rows-only
# registry entry (emb_ivf_ann_topk).

_D2 = (
    "list_sum(list_transform(list_zip({a}, {b}),"
    " p -> (p[1] - p[2]) * (p[1] - p[2])))"
)
_COS = (
    "round(list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))), 6)"
)


_E_EMBEDDINGS = (
    "SELECT vec_id, label,"
    " list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb\n"
    "  FROM embeddings WHERE embedding IS NOT NULL"
)


def _seeded_cand_cte(
    query_pred: str,
    corpus_pred: str,
    n_centroids: int,
    n_probe: int,
    e_sql: str = _E_EMBEDDINGS,
) -> str:
    """WITH-clause body producing `cand(query_id, vec_id, cosine)` —
    the DuckDB replay of `ivf_candidates_seeded` (same seeding, same
    d2 assignment/probe ranking with cluster-ascending tie-break, same
    rounded cosine, self-matches excluded, DISTINCT). `e_sql` swaps the
    vector source — it must yield (vec_id, label, emb DOUBLE[]); the
    default reads the embeddings table, doc_text_search_topk_ann feeds
    hashing-trick document vectors instead."""
    return f"""
e AS MATERIALIZED (
  {e_sql}
),
c AS MATERIALIZED (SELECT vec_id, label, emb FROM e WHERE {corpus_pred}),
cent AS MATERIALIZED (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, emb AS cv
  FROM c ORDER BY vec_id LIMIT {n_centroids}
),
assign AS MATERIALIZED (
  SELECT vec_id, cluster FROM (
    SELECT c.vec_id, cent.cluster,
           row_number() OVER (
             PARTITION BY c.vec_id
             ORDER BY {_D2.format(a='c.emb', b='cent.cv')}, cent.cluster
           ) AS rn
    FROM c CROSS JOIN cent
  ) WHERE rn = 1
),
q AS MATERIALIZED (SELECT vec_id AS query_id, emb AS qv FROM e WHERE {query_pred}),
probes AS MATERIALIZED (
  SELECT query_id, qv, cluster FROM (
    SELECT q.query_id, q.qv, cent.cluster,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY {_D2.format(a='q.qv', b='cent.cv')}, cent.cluster
           ) AS pr
    FROM q CROSS JOIN cent
  ) WHERE pr <= {n_probe}
),
cand AS MATERIALIZED (
  SELECT DISTINCT p.query_id, c.vec_id,
         {_COS.format(a='p.qv', b='c.emb')} AS cosine
  FROM probes p
  JOIN assign a ON a.cluster = p.cluster
  JOIN c ON c.vec_id = a.vec_id
  WHERE c.vec_id <> p.query_id
)"""


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL embeddings are filtered here (like every exact counterpart):
    # the IVF assignment UDF builds a dense numpy batch and would raise
    # on a None cell, breaking the "same downstream logic" twin contract
    # asymmetrically
    return register_views(spark, sf_dir, tables=("embeddings",))[
        "embeddings"
    ].filter(F.col("embedding").isNotNull())


@register(
    "emb_cosine_topk_ann",
    f"""
WITH {_seeded_cand_cte('vec_id < 5', 'TRUE', 16, 4)}
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
         ) AS rank
  FROM cand
) WHERE rank <= 10
""",
    doc="ANN twin of emb_cosine_topk_bruteforce: cosine top-10 for 5 "
    "query vectors through the IVF index (probe 4/16 inverted lists — "
    "the scoring join is equi on the list id, candidate set ~4× "
    "smaller than the corpus). Oracle-EXACT since round 6: the gate "
    "entry runs the SEEDED deterministic index (ivf_candidates_seeded) "
    "DuckDB replays bit-for-bit; the trained-centroid path keeps its "
    "pytest contracts (full probe ≡ exact as emb_ivf_full_probe_exact, "
    "partial-probe recall in tests/test_ivf.py).",
    tags=("similarity", "embeddings", "ann", "scale-twin"),
)
def q_cosine_topk_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.similarity import ivf_topk_seeded

    emb = _emb(spark, sf_dir)
    return ivf_topk_seeded(emb.filter(F.col("vec_id") < 5), emb, k=10, **_ANN)


@register(
    "emb_knn_classify_ann",
    f"""
WITH {_seeded_cand_cte('vec_id < 10', 'vec_id >= 10', 16, 4)},
topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
           ) AS rank
    FROM cand
  ) WHERE rank <= 5
),
votes AS (
  SELECT t.query_id, lab.label, count(*) AS n_votes
  FROM topk t JOIN e lab ON lab.vec_id = t.vec_id
  GROUP BY t.query_id, lab.label
)
SELECT query_id, label AS predicted_label, n_votes FROM (
  SELECT query_id, label, n_votes,
         row_number() OVER (
           PARTITION BY query_id ORDER BY n_votes DESC, label ASC
         ) AS rn
  FROM votes
) WHERE rn = 1
""",
    doc="ANN twin of emb_knn_classify: the identical majority-vote "
    "aggregate over the IVF retriever instead of the O(|Q|·|C|) "
    "scoring join. Oracle-EXACT since round 6 via the seeded "
    "deterministic index; trained-path ≥ 0.9 prediction agreement "
    "stays pinned in tests/test_ivf.py "
    "(test_knn_classify_ann_agreement).",
    tags=("similarity", "embeddings", "knn", "ann", "scale-twin"),
)
def q_knn_classify_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.similarity import (
        ivf_topk_seeded,
        knn_vote,
    )

    emb = _emb(spark, sf_dir)
    topk = ivf_topk_seeded(
        emb.filter(F.col("vec_id") < 10),
        emb.filter(F.col("vec_id") >= 10),
        k=5,
        **_ANN,
    )
    return knn_vote(topk, emb.select("vec_id", "label"))


def _mmr_ann_oracle() -> str:
    from flink_application_spark.plans.mmr_sql import mmr_oracle_sql

    with_body = f"""{_seeded_cand_cte('vec_id < 5', 'TRUE', 16, 4)},
tk AS MATERIALIZED (
  SELECT query_id, vec_id, cosine FROM (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
           ) AS rnk
    FROM cand
  ) WHERE rnk <= 20
)"""
    return mmr_oracle_sql(with_body, k_final=5, lam10=7)


@register(
    "emb_mmr_diversified_topk_ann",
    _mmr_ann_oracle(),
    doc="ANN twin of emb_mmr_diversified_topk: MMR re-ranking over an "
    "IVF top-20 retrieval (the O(k²) greedy never sees more than the "
    "candidate group either way). Oracle-EXACT since round 7: seeded "
    "deterministic index (ivf_candidates_seeded) + the integer-scored "
    "greedy unrolled in SQL (plans/mmr_sql.py). The trained-centroid "
    "path keeps ≥ 0.9 selection overlap vs the exact retriever on "
    "clustered data in tests/test_ivf.py "
    "(test_mmr_ann_retrieval_overlap).",
    tags=("similarity", "embeddings", "mmr", "ann", "scale-twin"),
)
def q_mmr_topk_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.similarity import (
        ivf_topk_seeded,
        mmr_rerank_cands,
    )

    emb = _emb(spark, sf_dir)
    cands = ivf_topk_seeded(emb.filter(F.col("vec_id") < 5), emb, k=20, **_ANN)
    return mmr_rerank_cands(
        cands.select("query_id", "vec_id", "cosine"), emb, k_final=5, lam=0.7
    )


@register(
    "emb_contrastive_triplets_ann",
    f"""
WITH {_seeded_cand_cte('vec_id < 20', 'TRUE', 16, 4)},
tk AS MATERIALIZED (
  SELECT query_id, vec_id, cosine FROM (
    SELECT query_id, vec_id, cosine,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
           ) AS rnk
    FROM cand
  ) WHERE rnk <= 50
),
scored AS (
  SELECT t.query_id, ql.label AS query_label,
         t.vec_id AS cand_id, cl.label AS cand_label, t.cosine
  FROM tk t
  JOIN e ql ON ql.vec_id = t.query_id
  JOIN e cl ON cl.vec_id = t.vec_id
),
best AS (
  SELECT query_id, query_label, cand_id, cand_label, cosine,
         row_number() OVER (
           PARTITION BY query_id, (cand_label = query_label)
           ORDER BY cosine DESC, cand_id ASC
         ) AS rn
  FROM scored
)
SELECT p.query_id AS query_id,
       p.query_label AS label,
       p.cand_id AS positive_id,
       p.cosine AS positive_cos,
       n.cand_id AS negative_id,
       n.cosine AS negative_cos,
       round(p.cosine - n.cosine, 6) + 0.0 AS margin
FROM best p
JOIN best n ON n.query_id = p.query_id AND n.rn = 1
WHERE p.rn = 1 AND p.cand_label = p.query_label
  AND n.cand_label <> n.query_label
""",
    doc="ANN twin of emb_contrastive_triplets: positives and hard "
    "negatives mined from an IVF top-50 neighborhood instead of the "
    "all-pairs scoring join — both live in the query's neighborhood "
    "by definition (a distant negative isn't hard). Oracle-EXACT since "
    "round 7 via the seeded deterministic index + the shared "
    "mine_triplets aggregate (the knn_vote conversion pattern); the "
    "trained path keeps its agreement pins in tests/test_ann_twins.py.",
    tags=("embeddings", "similarity", "training-prep", "ann", "scale-twin"),
)
def q_contrastive_triplets_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.similarity import (
        ivf_topk_seeded,
        mine_triplets,
    )

    emb = _emb(spark, sf_dir)
    cands = ivf_topk_seeded(emb.filter(F.col("vec_id") < 20), emb, k=50, **_ANN)
    return mine_triplets(
        cands.select("query_id", "vec_id", "cosine"),
        emb.select("vec_id", "label"),
    )


@register(
    "emb_label_noise_knn_ann",
    f"""
WITH {_seeded_cand_cte('TRUE', 'TRUE', 16, 4)},
topk AS (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id,
           row_number() OVER (
             PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
           ) AS rank
    FROM cand
  ) WHERE rank <= 5
)
SELECT ql.vec_id AS vec_id, ql.label AS label,
       CAST(sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) AS BIGINT)
         AS n_same_label,
       sum(CASE WHEN nl.label = ql.label THEN 1 ELSE 0 END) <= 1
         AS noise_candidate
FROM topk t
JOIN e ql ON ql.vec_id = t.query_id
JOIN e nl ON nl.vec_id = t.vec_id
GROUP BY ql.vec_id, ql.label
""",
    doc="ANN twin of emb_label_noise_knn: the label-agreement audit "
    "with the FULL corpus as the query set over the IVF retriever — "
    "the configuration where the exact form's O(n²) join hurts most "
    "at scale. Oracle-EXACT since round 6 via the seeded deterministic "
    "index; trained-path audit-flag agreement vs exact stays pinned in "
    "tests/test_ann_twins.py.",
    tags=("embeddings", "labels", "quality", "ann", "scale-twin"),
)
def q_label_noise_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.similarity import (
        ivf_topk_seeded,
        label_agreement,
    )
    from flink_application_spark.plans._memo import corpus_count_cached

    emb = _emb(spark, sf_dir)
    # full corpus as queries → candidate pairs ≈ n · n_probe · (n/k):
    # the one consumer whose pair volume clears the Arrow-scorer
    # threshold (~1M at sf0.1 — round-11's 19 s → 5.5 s A/B win). The
    # estimate reuses the session-cached corpus count (no extra job in
    # the steady state); every small-query twin keeps the JVM fold.
    n = corpus_count_cached(spark, emb, sf_dir)
    est = n * _ANN["n_probe"] * max(n // _ANN["n_centroids"], 1)
    topk = ivf_topk_seeded(emb, emb, k=5, **_ANN, est_pairs=est)
    return label_agreement(topk, emb.select("vec_id", "label"))


@register(
    "emb_radius_search_ann",
    f"""
WITH {_seeded_cand_cte('vec_id < 5', 'TRUE', 16, 4)}
SELECT query_id, vec_id, cosine FROM cand WHERE cosine >= 0.25
""",
    doc="ANN twin of emb_radius_search: the same cosine ≥ 0.25 radius "
    "filter over IVF probe candidates (equi-join on list id) instead "
    "of the query×corpus product. Structurally a SUBSET of the exact "
    "result (the radius filter applies to a candidate subset) — "
    "pinned on driver data in tests/test_ann_twins.py. Oracle-EXACT "
    "since round 6 via the seeded deterministic index; the "
    "trained-path ann ⊆ exact / full-probe ≡ exact contracts keep "
    "their pytest pins.",
    tags=("similarity", "embeddings", "range-search", "ann", "scale-twin"),
)
def q_radius_search_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.similarity import (
        ivf_candidates_seeded,
    )

    emb = _emb(spark, sf_dir)
    cand = ivf_candidates_seeded(emb.filter(F.col("vec_id") < 5), emb, **_ANN)
    return cand.filter(F.col("cosine") >= 0.25)


def _text_search_ann_oracle() -> str:
    from flink_application_spark.plans.vectorize_queries import _oracle_sql

    e_sql = (
        "SELECT doc_id AS vec_id, NULL AS label,\n"
        "         list_transform(embedding, v -> CAST(v AS DOUBLE)) AS emb\n"
        "  FROM emb_src\n"
        "  WHERE embedding IS NOT NULL\n"
        "    AND sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),\n"
        "                              CAST(embedding AS DOUBLE[]))) > 0"
    )
    return f"""
WITH emb_src AS ({_oracle_sql()}),
{_seeded_cand_cte('vec_id < 3', 'TRUE', 8, 3, e_sql=e_sql)}
SELECT query_id, vec_id, cosine, rank FROM (
  SELECT query_id, vec_id, cosine,
         row_number() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, vec_id ASC
         ) AS rank
  FROM cand
) WHERE rank <= 5
"""


@register(
    "doc_text_search_topk_ann",
    _text_search_ann_oracle(),
    doc="ANN twin of doc_text_search_topk: hashing-trick document "
    "vectors (codegen explode→histogram, vocabulary-free) searched "
    "through the IVF index — the full text→vector→ANN composition at "
    "its 100 TB operating point. Oracle-EXACT since round 7: the "
    "seeded deterministic index runs over the SAME hashing-trick "
    "vector CTE the exact composition's oracle uses (integer-count "
    "vectors make the d2 assignment exactly tie-stable cross-engine).",
    tags=("documents", "vectorize", "similarity", "search", "ann", "scale-twin"),
)
def q_text_search_topk_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.functions.vectors import norm
    from flink_application_spark.operators.similarity import ivf_topk_seeded
    from flink_application_spark.plans.vectorize_queries import (
        hashing_trick_features,
    )

    docs = register_views(spark, sf_dir, tables=("documents",))["documents"]
    vecs = (
        hashing_trick_features(docs)
        .select(F.col("doc_id").alias("vec_id"), "embedding")
        .filter(F.col("embedding").isNotNull() & (norm(F.col("embedding")) > 0))
        .persist()  # queries and corpus both read the vectorized frame
    )
    return ivf_topk_seeded(
        vecs.filter(F.col("vec_id") < 3), vecs, k=5, n_centroids=8, n_probe=3
    )


@register(
    "emb_ivf_exact_trained_topk",
    ivf_exact_trained_oracle_sql(k=10, n_centroids=8, iters=5, n_probe=2,
                                 n_queries=5),
    doc="Round-8 capstone of the determinism recipe: IVF retrieval "
    "whose coarse quantizer is TRAINED — 5 exact-integer Lloyd's "
    "rounds (operators/kmeans_exact.py), not merely seeded — with the "
    "ENTIRE index lifecycle oracle-replayed: training unroll (shared "
    "CTE stages with emb_kmeans_fit_exact_profile), corpus assignment, "
    "per-query probe ranking (n_probe=2 of 8 cells), exact-integer d² "
    "candidate scoring, per-query top-10 (ties → vec_id). Removes the "
    "'trained codebooks are float Lloyd's' conversion blocker for the "
    "IVF class: fitted centroids AND bit-determinism at once. Corpus "
    "vectors never shuffle; probes broadcast; the candidate join is "
    "equi on the list id — the similarity.ivf_topk scale shape.",
    tags=("similarity", "embeddings", "ann", "training", "exact"),
)
def q_ivf_exact_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.ivf_exact import (
        ivf_exact_trained_topk,
    )
    from flink_application_spark.plans._memo import kmeans_fit_exact_cached

    emb = _emb(spark, sf_dir)
    # shared with emb_kmeans_fit_exact_profile (same table, k, iters)
    cents, _ = kmeans_fit_exact_cached(spark, emb, sf_dir, 8, 5)
    return ivf_exact_trained_topk(
        emb, k=10, n_centroids=8, iters=5, n_probe=2, n_queries=5, cents=cents
    )


@register(
    "emb_pq_exact_trained_adc_topk",
    pq_exact_adc_oracle_sql(k=10, n_queries=5),
    doc="Round-8 trained-index conversion, PQ half: product-quantization "
    "ADC top-10 whose per-subspace codebooks are TRAINED by the "
    "exact-integer Lloyd's loop (8 subspaces × 8 codewords × 3 rounds "
    "over ppm subvector slices — operators/pq_exact.py). Corpus codes, "
    "per-query ADC tables (one exact-d² table per subspace per query, "
    "then m lookups + adds per candidate — the Jégou ADC shape), and "
    "the final ranking are all exact BIGINTs; the DuckDB oracle replays "
    "the ENTIRE lifecycle as 8 prefixed copies of the shared kmeans "
    "training unroll plus long-format code/book joins. Approximation "
    "error comes from quantization only — never float nondeterminism.",
    tags=("similarity", "embeddings", "ann", "training", "exact", "pq"),
)
def q_pq_exact_trained_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_application_spark.operators.pq_exact import pq_exact_adc_topk

    emb = _emb(spark, sf_dir)
    return pq_exact_adc_topk(emb, k=10, n_queries=5)
