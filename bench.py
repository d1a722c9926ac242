"""Headline-query benchmark. Prints ONE JSON line for the driver.

Runs the engine's headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Timings are per-query
wall clock including the full Spark plan execution and result collection
(outputs are top-k / small aggregates, so collection cost is noise).

Comparison target (BASELINE.md, reference at sf0.1 N=2,000 dim=64):
cosine 13.1 ms/q, euclidean 9.0, dot 5.7, phi 54.9; the engine batches
20 queries per job, so per-query latency = job_time / 20.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = (
    "knn_cosine_topk",
    "knn_euclidean_topk",
    "knn_dot_topk",
    "knn_phi_topk",
    "knn_cosine_filtered",
    "auto_cluster_phi",
    "form_pglyphs_by_label",
    "rel_pricing_summary",
    "rel_top_revenue_orders",
    "rel_revenue_by_nation",
    "rel_top_orders_per_customer",
    "rel_late_order_priority",
    "export_ordered",
    "import_dedup",
    "dataset_digest",
    # text / dedup / ANN entries appended as those modules land
    "doc_exact_dedup",
    "doc_minhash_near_dup",
    "doc_token_stats",
    "doc_language_id",
    "ann_ivf_recall",
)


def main() -> None:
    import aeuc_vector_db_spark.queries as Q
    from aeuc_vector_db_spark.session import get_spark

    spark = get_spark("bench")
    registry = Q.queries()

    # Warm the JVM/codegen/Arrow/python-worker paths once with real code
    # paths at the smallest sf so the first measured query doesn't pay
    # session bring-up (the baseline numbers are warm-loop measurements).
    warm_dir = "/root/testdata/sf0.001"
    for warm_q in ("knn_cosine_topk", "knn_phi_topk"):
        if warm_q in registry:
            registry[warm_q](spark, warm_dir).collect()

    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = registry.get(name)
        if fn is None:
            continue
        t0 = time.time()
        rows = fn(spark, SF_DIR).collect()
        dt = time.time() - t0
        per_query[name] = round(dt, 4)
        total += dt
        print(f"# {name}: {dt:.3f}s ({len(rows)} rows)", file=sys.stderr)

    sf = os.path.basename(SF_DIR.rstrip("/")).replace("sf", "")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(total, 3),
                "unit": "sec",
                "queries": per_query,
                "sf": sf_val,
            }
        )
    )


if __name__ == "__main__":
    main()
