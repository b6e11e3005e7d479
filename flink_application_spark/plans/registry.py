"""Central query registry.

A ``QuerySpec`` couples a Spark implementation (built from the operator
library) with the ANSI-SQL oracle text DuckDB runs on the same parquet
tables. The driver compares the two at sf0.01 (row count + schema +
order-insensitive value hash); ``tests/test_oracle_parity.py`` runs the
same comparison locally at sf0.001 so regressions surface before the
driver does.

Column-name contract: every computed/aggregate column is aliased
identically on both sides — the driver sorts columns by name before
hashing values.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    spark: SparkQuery
    # None → non-SQL-expressible; driver records a rows-only check.
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc, tags=tags)
        return fn

    return deco


def REGISTRY_GET(name: str) -> QuerySpec:
    _load_all()
    return REGISTRY[name]


def all_queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every query module exactly once (registration side effect).

    Import ORDER is deliberate: the driver's correctness gate samples
    the first 50 registered queries, so the reference-parity core (cdr,
    reference_ops = every §2-mapped surface) registers first, followed
    by the LLM-pipeline families; the pure-SQL breadth modules
    (sql_surface/text/tpch — locally oracle-tested like everything
    else) register last."""
    global _LOADED
    if _LOADED:
        return
    from flink_application_spark.plans import cdr  # noqa: F401  (reference core)
    from flink_application_spark.plans import reference_ops  # noqa: F401  (§2 W2/P12)
    from flink_application_spark.plans import (  # noqa: F401
        asof_queries,
        cleaning_queries,
        dedup_queries,
        multimodal_queries,
        pca_queries,
        pipeline_queries,
        similarity_queries,
        sql_surface,
        text_queries,
        tpch_extra,
    )
    from flink_application_spark.plans import multimodal_extra  # noqa: F401  (late)
    from flink_application_spark.plans import vectorize_queries  # noqa: F401  (late)
    from flink_application_spark.plans import leakage_queries  # noqa: F401  (late)
    from flink_application_spark.plans import clustering_queries  # noqa: F401  (late)
    from flink_application_spark.plans import classifier_queries  # noqa: F401  (late)
    from flink_application_spark.plans import sampling_queries  # noqa: F401  (late)
    from flink_application_spark.plans import rangejoin_queries  # noqa: F401  (late)
    from flink_application_spark.plans import scrub_queries  # noqa: F401  (late)
    from flink_application_spark.plans import lm_queries  # noqa: F401  (late)
    from flink_application_spark.plans import curation_queries  # noqa: F401  (late)
    from flink_application_spark.plans import graph_queries  # noqa: F401  (late)
    from flink_application_spark.plans import training_prep_queries  # noqa: F401  (late)
    from flink_application_spark.plans import contrastive_queries  # noqa: F401  (late)
    from flink_application_spark.plans import merge_queries  # noqa: F401  (late)
    from flink_application_spark.plans import recursive_queries  # noqa: F401  (late)
    from flink_application_spark.plans import cep_queries  # noqa: F401  (late)
    from flink_application_spark.plans import seasonal_queries  # noqa: F401  (late)
    from flink_application_spark.plans import entropy_queries  # noqa: F401  (late)
    from flink_application_spark.plans import semdedup_queries  # noqa: F401  (late)
    from flink_application_spark.plans import dsir_queries  # noqa: F401  (late)
    from flink_application_spark.plans import bpe_queries  # noqa: F401  (late)
    from flink_application_spark.plans import chunk_queries  # noqa: F401  (late)
    from flink_application_spark.plans import sketch_queries  # noqa: F401  (late)
    from flink_application_spark.plans import gate_queries  # noqa: F401  (late)
    from flink_application_spark.plans import curriculum_queries  # noqa: F401  (late)
    from flink_application_spark.plans import matryoshka_queries  # noqa: F401  (late)
    from flink_application_spark.plans import datacard_queries  # noqa: F401  (late)
    from flink_application_spark.plans import labelnoise_queries  # noqa: F401  (late)
    from flink_application_spark.plans import textsearch_queries  # noqa: F401  (late)
    from flink_application_spark.plans import compress_queries  # noqa: F401  (late)
    from flink_application_spark.plans import cumulate_queries  # noqa: F401  (late)
    from flink_application_spark.plans import fingerprint_queries  # noqa: F401  (late)
    from flink_application_spark.plans import boilerplate_queries  # noqa: F401  (late)
    from flink_application_spark.plans import pq_queries  # noqa: F401  (late)
    from flink_application_spark.plans import ivfadc_queries  # noqa: F401  (late)
    from flink_application_spark.plans import drift_queries  # noqa: F401  (late)
    from flink_application_spark.plans import mixture_exec_queries  # noqa: F401  (late)
    from flink_application_spark.plans import semdedup_text_queries  # noqa: F401  (late)
    from flink_application_spark.plans import ewma_queries  # noqa: F401  (late)
    from flink_application_spark.plans import ndcg_queries  # noqa: F401  (late)
    from flink_application_spark.plans import nlpstats_queries  # noqa: F401  (late)
    from flink_application_spark.plans import substring_dedup_queries  # noqa: F401  (late)
    from flink_application_spark.plans import ann_twins  # noqa: F401  (late)
    from flink_application_spark.plans import estimator_queries  # noqa: F401  (late)
    from flink_application_spark.plans import quantize_extra  # noqa: F401  (late)
    from flink_application_spark.plans import fusion_queries  # noqa: F401  (late)
    from flink_application_spark.plans import bloom_queries  # noqa: F401  (late)
    from flink_application_spark.plans import doremi_queries  # noqa: F401  (late)
    from flink_application_spark.plans import opq_queries  # noqa: F401  (late)
    from flink_application_spark.plans import lr_queries  # noqa: F401  (late)
    from flink_application_spark.plans import nndescent_queries  # noqa: F401  (late)
    from flink_application_spark.plans import packing_queries  # noqa: F401  (late)
    from flink_application_spark.plans import bootstrap_queries  # noqa: F401  (late)

    _reorder_for_sample_window()
    _LOADED = True


# The driver's correctness gate samples the FIRST 50 registered
# queries. This list IS that window, curated explicitly (import order
# alone can't express it once queries live in many modules).
#
# Round-7 rotation (verdict item 5: every query has ≥1 driver row, so
# priority is now AGE plus anything this round's code touched). The
# window front-loads (a) the four round-7 rows-only → oracle-EXACT
# conversions (MMR pair + contrastive/text-search twins — the driver
# must hash-check them, not rows-only them), (b) every query whose
# lineage the shared two-phase scan rewrite (operators/twophase.py)
# touched — ranks/ntile/packing/epoch-shard consumers, and (c) the
# OLDEST evidence: all remaining r01-sampled names, then r02 names
# prioritizing the mine_triplets-refactor counterpart and the mm_*
# multimodal family. r02 names that did not fit (18:
# doc_split_train_val_test, doc_weighted_sample,
# emb_cosine_near_dup_pairs, emb_dup_components, emb_ivfadc_topk,
# emb_kmeans_assign, emb_pca_gram, emb_pq_codes, emb_semdedup_flags,
# events_asof_last_signup, events_cep_signup_purchase_no_error,
# events_funnel_conversion, events_global_interval_join,
# events_interval_join_purchase_clicks, events_latest_per_user,
# scalar_function_library, tpch_q5_local_supplier,
# vocab_bpe_pair_counts) rotate into round 8 together with the r03
# tpch/sql_surface breadth. Everything not listed keeps its
# import-order position.
SAMPLE_WINDOW = [
    # round-7 rows-only → oracle-EXACT conversions (integer-scored
    # greedy MMR unrolled in SQL + seeded-IVF retrieval; verdict item 4)
    "emb_mmr_diversified_topk",
    "emb_mmr_diversified_topk_ann",
    "emb_contrastive_triplets_ann",
    "doc_text_search_topk_ann",
    # round-7 CEP conversions: the automaton queries now carry
    # recursive-CTE oracles (greedy walk unrolled per cursor step)
    "events_cep_funnel_matches",
    "events_cep_error_burst_recovery",
    "events_cep_clean_checkout",
    # touched by the two-phase scan rewrite (pinned partitioning,
    # shared offset attach, ntile single-execution): re-confirm every
    # consumer of ranks/packing/export
    "vocab_gini_concentration",
    "doc_curriculum_buckets",
    "customer_rfm_segmentation",
    "doc_epoch_shuffle_shards",
    "corpus_shard_manifest",
    "window_ntile_quartiles",
    "doc_pack_sequences",
    "doc_length_percentile_filter",
    "percentile_quantity_by_flag",
    "corpus_pack_spans",
    "corpus_pack_stats",
    # oldest evidence: every remaining r01-sampled name
    "doc_blocklist_filter",
    "doc_near_dup_edit_distance",
    "doc_ngram_jaccard_topk",
    "doc_pii_redaction",
    "doc_simhash",
    "doc_simhash_near_dup_pairs",
    "doc_stratified_sample",
    "emb_centroid_per_label",
    "emb_int8_quantization_error",
    "emb_ivf_ann_topk",
    "events_time_weighted_avg",
    "events_zorder_key",
    "mm_audio_window_features",
    "mm_image_features",
    "mm_image_meta",
    "orders_daily_gapfill",
    "vocab_count_min_estimate",
    # r02 evidence: the exact counterpart of this round's
    # mine_triplets refactor first, then the mm_* family, then breadth
    "emb_contrastive_triplets",
    "mm_frame_delta_scene_changes",
    "mm_frame_sample",
    "corpus_mixture_plan",
    "corpus_temperature_mixture",
    "customer_apply_changelog",
    "customer_tree_depth_recursive_cte",
    "doc_chunk_windows",
    "doc_dsir_log_weights",
    "doc_dsir_selection",
    "doc_jaccard_topk_thresholded",
    # round-7 additions, sampled the round they land (displacing the
    # doc_repeated_ngram_scrub / doc_quality_gate_audit /
    # doc_quality_classifier_score / doc_novelty_scores
    # re-confirmations to round 8): the deterministic mergeable HLL
    # rollup, the exact-integer Lloyd's trainer, the exact-integer
    # power iteration, and the exact-integer PageRank — all oracle-exact
    "events_hll_det_rollup",
    "emb_kmeans_fit_exact_profile",
    "emb_pca_power_exact",
    "doc_simgraph_pagerank_exact",
]


def _reorder_for_sample_window() -> None:
    missing = [n for n in SAMPLE_WINDOW if n not in REGISTRY]
    if missing:  # fail loudly — a silent miss shrinks the window
        raise RuntimeError(f"SAMPLE_WINDOW names not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in SAMPLE_WINDOW}
    ordered.update({n: s for n, s in REGISTRY.items() if n not in ordered})
    REGISTRY.clear()
    REGISTRY.update(ordered)
