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
# (CORRECTNESS_r02..r10 each hold exactly 50 rows regardless of registry
# size). Ordering therefore decides which queries get a driver-verified
# row each round. With 168 declared queries and a 50-row window, a
# query gets a driver row at best every ceil(168/50) ≈ 3-4 rounds; the
# rotation policy is: (1) queries that have NEVER had a driver row go
# first, (2) new-in-this-round queries must sit inside position 50,
# (3) remaining slots go to the longest-stale previously-verified
# queries. Every rotation is preceded by a full local
# tools/check_correctness.py sweep so rotated-out queries stay verified
# in-repo between their driver rows. COVERAGE.md maps each query to the
# round whose CORRECTNESS file holds its green row.
DRIVER_PRIORITY: tuple[str, ...] = (
    # --- round-11 window, positions 1-50 (VERDICT r10 #2) ---
    # Positions 1-12: the r7-window stragglers — the clustering family
    # and the doc text-stats singles, whose newest driver rows are
    # CORRECTNESS_r07 (4 rounds stale at r11, the oldest anywhere in
    # the registry); each re-verified green in the round-11 full local
    # sweep before this rotation.
    "centroids_by_label",
    "inertia_by_label",
    "form_pglyphs_by_label",
    "phi_bands",
    "auto_cluster_phi",
    "doc_token_stats",
    "doc_term_frequencies",
    "doc_tfidf_topk",
    "doc_bigram_topk",
    "doc_language_id",
    "doc_quality_score",
    "doc_fingerprint",
    # Positions 13-18: new in round 11 (never had a driver row):
    # the declared star-contraction components query, the native-codec
    # canary, the incremental MinHash dedup-index query, the
    # cross-source contamination matrix, the CUSUM change-point
    # detector, and the weighted priority sample.
    "rel_trade_components",
    "multimodal_codec_canary",
    "doc_incremental_minhash_dedup",
    "doc_cross_source_contamination",
    "events_cusum_alarms",
    "doc_weighted_sample",
    # Positions 19-50: 32 of the 50 queries whose newest driver row is
    # CORRECTNESS_r08 (3 rounds stale at r11). The 18 that do not fit
    # (the alphabetical tail — all from the heavily-redundant rel_*
    # family plus sql_entry_hll_distinct) are queued right after
    # position 50, first in line for r12; they stay covered by the
    # in-repo full sweep meanwhile.
    "ann_pq_refine_recall",
    "core_stability_composite",
    "delete_recompute",
    "doc_bm25_indexed_topk",
    "doc_bpe_tokenize",
    "doc_curriculum_order",
    "doc_leakproof_kfold",
    "doc_prefix_edit1_pairs",
    "doc_quality_gate_sketch",
    "doc_vocab_overlap_hll",
    "emb_drift_split_stats",
    "emb_matryoshka_topk",
    "emb_mmr_rerank",
    "emb_semantic_dedup_keep_one",
    "emb_semantic_dedup_learned",
    "events_cohort_retention",
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
    "multimodal_image_near_dup",
    "rel_big_volume_customers",
    "rel_bloom_semijoin_revenue",
    # --- positions ≥ 51: everything below stays covered by the
    # in-repo full sweeps between driver rows. First in line for r12:
    # the r8-window tail here, then the r9-window set rotates back in.
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
