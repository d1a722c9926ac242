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
    # --- round-13 window, positions 1-50 (VERDICT r12 #1) ---
    # Positions 1-23: the r9-window tail — the 23 queries whose newest
    # driver rows are CORRECTNESS_r09 (4 rounds stale at r13, the
    # oldest anywhere in the registry); each re-verified green in the
    # round-13 full local sweep before this rotation.
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
    # Position 24: new in round 13 (never had a driver row): the
    # hash-matched PCA-apply arithmetic — project_components under an
    # integer-derived literal matrix, the same code path pca_project
    # uses to apply its learned components (VERDICT r12 #8).
    "emb_pca_apply",
    # Positions 25-50: the alphabetical head (26) of the 50 queries
    # whose newest driver row is CORRECTNESS_r10 (3 rounds stale). The
    # 24 that do not fit (manifest_merge_dv_read … rel_trade_pagerank_
    # weighted, alphabetical tail) are queued right after position 50,
    # first in line for r14; they stay covered by the in-repo full
    # sweep meanwhile.
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
    # in-repo full sweeps between driver rows. First in line for r14:
    # the r10-window tail here, then the r11 set rotates back in.
    "manifest_merge_dv_read",
    "manifest_rename_read",
    "manifest_skipping_read",
    "manifest_widening_read",
    "manifest_zorder_read",
    "multimodal_native_codec_stats",
    "rel_acctbal_by_region_nation",
    "rel_asof_latest_order",
    "rel_cube_order_status",
    "rel_customers_both_years",
    "rel_exact_median_price",
    "rel_high_value_customers",
    "rel_orders_by_month",
    "rel_orders_within_30d",
    "rel_part_skyline",
    "rel_part_supplier_variety",
    "rel_peak_open_orders_hist",
    "rel_pivot_status_by_priority",
    "rel_price_percentiles",
    "rel_rfm_segments",
    "rel_rollup_acctbal",
    "rel_skew_salted_revenue",
    "rel_trade_pagerank",
    "rel_trade_pagerank_weighted",
)


def _ordered() -> dict[str, tuple[QueryFn, Optional[str]]]:
    head = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    head.update({n: v for n, v in REGISTRY.items() if n not in head})
    return head


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ordered().items() if sql is not None}
