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
    # --- round-12 window, positions 1-50 (VERDICT r11 #4) ---
    # Positions 1-18: the r8-window tail — the rel_* alphabetical
    # remainder plus sql_entry_hll_distinct, whose newest driver rows
    # are CORRECTNESS_r08 (4 rounds stale at r12, the oldest anywhere
    # in the registry); each re-verified green in the round-12 full
    # local sweep before this rotation.
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
    # Positions 19-22: new in round 12 (never had a driver row): the
    # bucketed incremental-dedup serve path (VERDICT r11 #1), hash-
    # checked against the same full-recompute oracle as the flat path;
    # OPQ recall (rows-only, floor+canary gated like the rest of the
    # recall family); LSH-blocked contrastive hard-negative mining
    # (oracle = the identical bucket/cosine arithmetic in SQL); and
    # the τ=2 temperature source mix (Hamilton integer allocation,
    # oracle-exact).
    "doc_incremental_minhash_bucketed",
    "ann_opq_recall",
    "emb_hard_negatives",
    "doc_temperature_mix",
    "doc_pii_ccn",
    # Positions 24-50: the alphabetical head (27) of the 50 queries
    # whose newest driver row is CORRECTNESS_r09 (3 rounds stale at
    # r12). The 23 that do not fit (knn_dot_topk, knn_euclidean_topk,
    # manifest_bucketed_dv_read, manifest_cdc_incremental_agg …
    # two_level_search, alphabetical tail) are queued right after
    # position 50, first in line for r13; they stay covered by the
    # in-repo full sweep meanwhile.
    "ann_ivf_recall",
    "ann_ivfadc_recall",
    "ann_pq_recall",
    "doc_bm25_topk",
    "doc_clean_corpus_pipeline",
    "doc_decontaminate",
    "doc_epoch_shuffle",
    "doc_heavy_hitters",
    "doc_hybrid_rrf_topk",
    "doc_leakproof_split",
    "doc_pii_scrub",
    "doc_repetition_ratio",
    "doc_sequence_pack",
    "doc_source_rebalance",
    "doc_source_token_budget",
    "doc_stratified_sample",
    "doc_unigram_logprob",
    "doc_winnowing_fingerprint",
    "emb_pca_project",
    "emb_quantize_int8",
    "embedding_normalize",
    "events_hourly_window",
    "events_json_props",
    "export_ordered",
    "import_dedup",
    "ivf_arrow_pruned_search",
    "knn_cosine_range",
    # --- positions ≥ 51: everything below stays covered by the
    # in-repo full sweeps between driver rows. First in line for r13:
    # the r9-window tail here, then the r10-window set rotates back in.
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
)


def _ordered() -> dict[str, tuple[QueryFn, Optional[str]]]:
    head = {n: REGISTRY[n] for n in DRIVER_PRIORITY if n in REGISTRY}
    head.update({n: v for n, v in REGISTRY.items() if n not in head})
    return head


def queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _ordered().items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _ordered().items() if sql is not None}
