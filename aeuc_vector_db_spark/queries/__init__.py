"""Declared query registry — the driver-facing contract.

Each entry pairs a Spark callable `(spark, sf_dir) -> DataFrame` with an
equivalent DuckDB oracle SQL string (or None for genuinely
non-SQL-expressible ops, which get a weaker rows-only check).

Determinism rules (FIXTURES.md): float outputs rounded at the end, all
vector math in DOUBLE with identical left-to-right fold order on both
sides (verified bit-identical), total ORDER BY with a unique key wherever
a LIMIT exists, surrogate ids via sha2 of sorted member ids, timestamps
exported as epoch microseconds.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[QueryFn, Optional[str]]] = {}

# Defense in depth: one broken module must never zero out the whole
# registry (round-1 failure mode — a missing module made the package
# unimportable and the driver saw zero queries). Core is imported
# unguarded (if it breaks, nothing works anyway and the error should be
# loud); the rest degrade gracefully.
from aeuc_vector_db_spark.queries import core  # noqa: E402

REGISTRY.update(core.QUERIES)

for _mod_name in (
    "relational",
    "textops",
    "ann",
    "streaming_q",
    "multimodal_q",
    "curation_q",
    "manifest_q",
    "sql_q",
    # composites LAST: it imports the other query modules' FOLDED dicts
    "composites",
):
    try:
        _mod = __import__(
            f"aeuc_vector_db_spark.queries.{_mod_name}", fromlist=["QUERIES"]
        )
        REGISTRY.update(_mod.QUERIES)
    except ModuleNotFoundError as _exc:
        # tolerate only the module itself being absent (not-yet-built);
        # a transitive import failure inside an EXISTING module must be
        # loud, or whole query families silently vanish from the driver
        if _exc.name != f"aeuc_vector_db_spark.queries.{_mod_name}":
            raise
        import sys as _sys

        print(
            f"warning: query module {_mod_name!r} not found — its queries "
            "are not registered",
            file=_sys.stderr,
        )


# The driver's correctness pass checks the FIRST 50 registry entries
# (CORRECTNESS_r02..r14 each hold exactly 50 rows regardless of registry
# size). Ordering therefore decides which queries get a driver-verified
# row each round. With 150 declared queries (round 14 folded 32
# long-green singles into 5 tagged composites; round 15 added the three
# literal-parameter oracle twins, VERDICT r14 #1) and a 50-row window,
# every query gets a driver row every ceil(150/50) = 3 rounds — the
# freshness discipline stays arithmetically satisfiable with ZERO slack
# slots left: the next new query must displace via a further fold. The
# rotation policy is: (1) queries that have NEVER had a driver row go
# first, (2) new-in-this-round queries must sit inside position 50,
# (3) remaining slots go to the longest-stale previously-verified
# queries. Every rotation is preceded by a full local
# tools/check_correctness.py sweep so rotated-out queries stay verified
# in-repo between their driver rows. COVERAGE.md maps each query to the
# round whose CORRECTNESS file holds its green row.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- round-16 window, positions 1-50: the full r13-window set
    # (50 queries, 3 rounds stale at r16 — the COVERAGE.md schedule's
    # r16 slot; they must take rows now or they break the ≤3-round
    # freshness discipline). No new queries this round (optimization
    # round — the registry is feature-frozen), so no slack slots are
    # consumed and the rotation is the pure scheduled block shift.
    "knn_dot_topk",
    "knn_euclidean_topk",
    "manifest_bucketed_dv_read",
    "manifest_cdc_incremental_agg",
    "manifest_dnf_skipping_read",
    "manifest_in_skipping_read",
    "manifest_incremental_read",
    "manifest_merge_read",
    "manifest_null_skipping_read",
    "manifest_schema_evolution_read",
    "multimodal_feature_stats",
    "multimodal_transform_stats",
    "rel_late_order_priority",
    "rel_parts_never_ordered",
    "rel_pricing_summary",
    "rel_product_type_profit",
    "rel_returned_item_revenue",
    "rel_revenue_by_nation",
    "rel_top_orders_per_customer",
    "rel_top_revenue_orders",
    "sql_entry_knn_cosine",
    "sql_entry_pricing",
    "two_level_search",
    "emb_pca_apply",
    "doc_cms_freq",
    "doc_dedup_keep_one",
    "doc_exact_dedup",
    "doc_hll_distinct",
    "doc_minhash_capped",
    "doc_minhash_near_dup",
    "doc_ngram_jaccard",
    "doc_pipeline_e2e",
    "doc_simhash16",
    "doc_substring_dedup",
    "doc_token_diversity",
    "emb_binary_hamming_topk",
    "emb_near_dup_cosine",
    "events_click_attribution",
    "events_time_weighted_avg",
    "events_transition_matrix",
    "events_value_trend_ols",
    "ivf_euclidean_pruned_search",
    "ivf_phi_pruned_search",
    "ivf_radius_pruned_search",
    "knn_cosine_arrow_topk",
    "knn_cosine_filtered",
    "knn_phi_topk",
    "manifest_bloom_read",
    "manifest_cdc_read",
    "manifest_dv_read",
    # --- positions ≥ 51: everything below stays covered by the
    # in-repo full sweeps between driver rows. First in line for r17:
    # the r14 window (5 composites carrying all 32 folded singles +
    # unfolded r10-tail + r11 set); then the r15 window (3 literal
    # twins + the r12 set) again at r18.
    "rel_agg_composite",
    "manifest_read_composite",
    "cluster_family_composite",
    "text_stats_composite",
    "io_roundtrip_composite",
    "multimodal_native_codec_stats",
    "rel_asof_latest_order",
    "rel_part_skyline",
    "rel_part_supplier_variety",
    "rel_peak_open_orders_hist",
    "rel_rfm_segments",
    "rel_skew_salted_revenue",
    "rel_trade_pagerank",
    "rel_trade_pagerank_weighted",
    "ann_pq_refine_recall",
    "core_stability_composite",
    "doc_bm25_indexed_topk",
    "doc_bpe_tokenize",
    "doc_cross_source_contamination",
    "doc_curriculum_order",
    "doc_incremental_minhash_dedup",
    "doc_leakproof_kfold",
    "doc_prefix_edit1_pairs",
    "doc_quality_gate_sketch",
    "doc_weighted_sample",
    "emb_drift_split_stats",
    "emb_matryoshka_topk",
    "emb_mmr_rerank",
    "emb_semantic_dedup_keep_one",
    "emb_semantic_dedup_learned",
    "events_cohort_retention",
    "events_cusum_alarms",
    "events_funnel_conversion",
    "events_resample_locf",
    "events_scd2_point_in_time",
    "events_sessionize",
    "events_value_outliers_mad",
    "events_windowed_hll",
    "ivf_incremental_search",
    "ivf_pruned_search",
    "knn_cosine_topk",
    "knn_maxsim_topk",
    "manifest_merge_clauses_read",
    "manifest_ndv_read",
    "multimodal_audio_near_dup",
    "multimodal_codec_canary",
    "multimodal_image_near_dup",
    "rel_big_volume_customers",
    "rel_bloom_semijoin_revenue",
    "rel_trade_components",
    # --- the round-15 window (3 literal twins + r12 set), due again
    # at r18 per the COVERAGE.md schedule.
    "ann_pq_adc_apply",
    "doc_bpe_encode_literal",
    "emb_cell_assign_literal",
    "ann_ivf_recall",
    "ann_ivfadc_recall",
    "ann_opq_recall",
    "ann_pq_recall",
    "doc_bm25_topk",
    "doc_clean_corpus_pipeline",
    "doc_decontaminate",
    "doc_epoch_shuffle",
    "doc_heavy_hitters",
    "doc_hybrid_rrf_topk",
    "doc_incremental_minhash_bucketed",
    "doc_leakproof_split",
    "doc_pii_ccn",
    "doc_pii_scrub",
    "doc_repetition_ratio",
    "doc_sequence_pack",
    "doc_source_rebalance",
    "doc_source_token_budget",
    "doc_stratified_sample",
    "doc_temperature_mix",
    "doc_unigram_logprob",
    "doc_winnowing_fingerprint",
    "emb_hard_negatives",
    "emb_pca_project",
    "emb_quantize_int8",
    "events_hourly_window",
    "events_json_props",
    "ivf_arrow_pruned_search",
    "knn_cosine_range",
    "rel_cheapest_part_offer",
    "rel_disjunctive_promo_revenue",
    "rel_exists_late_shipment",
    "rel_fk_violations",
    "rel_grouping_sets_revenue",
    "rel_idle_rich_customers",
    "rel_market_share_customers",
    "rel_nation_share_by_year",
    "rel_order_count_distribution",
    "rel_order_price_drift",
    "rel_price_quantile_sketch",
    "rel_rolling_30d_revenue",
    "rel_small_qty_part_revenue",
    "rel_top_quarter_supplier",
    "rel_unpivot_part_metrics",
    "rel_volume_shipping",
    "rel_waiting_suppliers",
    "sql_entry_hll_distinct",
)


def _ordered() -> dict[str, tuple[QueryFn, Optional[str]]]:
    head = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    head.update({n: v for n, v in REGISTRY.items() if n not in head})
    return head


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ordered().items() if sql is not None}
