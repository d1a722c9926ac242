"""Tagged-row composites of long-green single-purpose queries (round 14,
VERDICT r13 #2).

At 174 declared queries a 50-row driver window cycles in 4 rounds,
permanently breaking the repo's own ≤3-round freshness discipline
(COVERAGE.md). The fix is the `core_stability_composite` precedent
scaled up: fold maximally-stable singles — trivial relational
aggregates, the long-green manifest reads, the reference cluster
family, text statistics, and the I/O round-trips — into five tagged
composites. Each part keeps its OWN oracle arithmetic verbatim (the
part's original SQL becomes a CTE; the part's original DataFrame
builder runs unchanged); the composite melts every part's full result
into (part, k, v_str, v_num) rows where `k` embeds the part's key
values, so the driver's order-insensitive value hash still covers
every row and column of every part — any part's failure flips the
composite hash. The folded singles stay in their home modules under
`FOLDED` dicts (still individually plan-gated in tests/test_plans.py
and runnable by bench.py's headline loop); only their driver-window
slots are pooled.

Melt kinds: string columns ride in v_str; int/bigint columns ride in
v_str as their decimal string (exact at ANY magnitude — a 64-bit
fingerprint cast to double would silently collide); doubles ride in
v_num (bit-identical both sides, as the originals proved). Key columns
are embedded in k as `col:key1|key2` via concat_ws, which skips NULLs
identically in Spark and DuckDB.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aeuc_vector_db_spark.queries import core as _core
from aeuc_vector_db_spark.queries import manifest_q as _manifest_q
from aeuc_vector_db_spark.queries import relational as _relational
from aeuc_vector_db_spark.queries import textops as _textops

_PARTS: dict[str, tuple] = {}
for _mod in (_core, _manifest_q, _relational, _textops):
    _PARTS.update(_mod.FOLDED)

# (part, key_cols, [(value_col, kind)]) — kind "str" | "int" | "dbl".
# Kinds are pinned statically (not sniffed from df.dtypes) so a part's
# schema drift fails loudly as a cast/name error instead of silently
# changing the melt.
_SPECS: dict[str, list[tuple[str, list[str], list[tuple[str, str]]]]] = {
    "rel_agg_composite": [
        ("rel_acctbal_by_region_nation", ["r_name", "n_name"],
         [("avg_acctbal", "dbl"), ("n_customers", "int")]),
        ("rel_cube_order_status", ["o_orderpriority", "o_orderstatus"],
         [("n_orders", "int")]),
        ("rel_customers_both_years", [],
         [("both_years", "int"), ("only_1995", "int")]),
        ("rel_exact_median_price", ["l_returnflag", "l_linestatus"],
         [("median_price", "dbl")]),
        ("rel_high_value_customers", ["c_custkey"],
         [("c_name", "str"), ("total_spend", "dbl"), ("n_orders", "int")]),
        ("rel_orders_by_month", ["month"],
         [("n_orders", "int"), ("n_customers", "int"), ("total_price", "dbl")]),
        ("rel_orders_within_30d", ["custkey"], [("n_close_pairs", "int")]),
        ("rel_pivot_status_by_priority", ["o_orderpriority"],
         [("n_f", "int"), ("n_o", "int"), ("n_p", "int")]),
        ("rel_price_percentiles", ["o_orderpriority"],
         [("n_orders", "int"), ("p50", "dbl"), ("p90", "dbl"), ("p99", "dbl")]),
        ("rel_rollup_acctbal", ["r_name", "n_name"],
         [("n_customers", "int"), ("total_acctbal", "dbl")]),
    ],
    "manifest_read_composite": [
        ("manifest_merge_dv_read", ["source"],
         [("n_docs", "int"), ("sum_chars", "int"), ("sum_doc_id", "int")]),
        ("manifest_rename_read", ["lang"],
         [("n_docs", "int"), ("sum_id", "int"), ("sum_len", "int")]),
        ("manifest_skipping_read", ["lang"],
         [("n_docs", "int"), ("sum_doc_id", "int"), ("sum_chars", "int")]),
        ("manifest_widening_read", ["lang"],
         [("n_docs", "int"), ("sum_chars", "int"), ("sum_score", "int")]),
        ("manifest_zorder_read", ["lang"],
         [("n_docs", "int"), ("sum_doc_id", "int"), ("sum_chars", "int")]),
    ],
    "cluster_family_composite": [
        ("auto_cluster_phi", ["band", "cluster_tag"],
         [("pglyph_id", "str"), ("member_count", "int"), ("inertia", "dbl")]),
        ("centroids_by_label", ["label", "pos"], [("c", "dbl")]),
        ("delete_recompute", ["label"],
         [("member_count", "int"), ("inertia", "dbl")]),
        ("form_pglyphs_by_label", ["label"],
         [("pglyph_id", "str"), ("member_count", "int"), ("inertia", "dbl")]),
        ("inertia_by_label", ["label"], [("inertia", "dbl")]),
        ("phi_bands", ["vec_id"], [("band", "int"), ("norm", "dbl")]),
        # round 15: the OPQ serve half under a literal orthogonal dyadic
        # rotation — a NEW part (never a single), added here instead of
        # as a 151st registry entry so ceil(registry/50) stays 3
        ("emb_rotation_apply_literal", ["vec_id"],
         [("p1", "dbl"), ("p2", "dbl"), ("p3", "dbl"), ("p4", "dbl"),
          ("p5", "dbl"), ("p6", "dbl"), ("p7", "dbl"), ("p8", "dbl"),
          ("wsum", "dbl")]),
    ],
    "text_stats_composite": [
        ("doc_bigram_topk", ["bigram"], [("cnt", "int"), ("rank", "int")]),
        ("doc_fingerprint", ["doc_id"], [("fingerprint", "int")]),
        ("doc_language_id", ["doc_id"],
         [("lang", "str"), ("lang_pred", "str")]),
        ("doc_quality_score", ["doc_id"],
         [("n_tokens", "int"), ("quality", "dbl")]),
        ("doc_term_frequencies", ["token"],
         [("cnt", "int"), ("rank", "int")]),
        ("doc_tfidf_topk", ["doc_id", "token"],
         [("score", "dbl"), ("rank", "int")]),
        ("doc_token_stats", ["doc_id"],
         [("n_tokens", "int"), ("n_distinct", "int"),
          ("avg_token_len", "dbl"), ("est_bpe_tokens", "int")]),
        ("doc_vocab_overlap_hll", [],
         [("exact_intersection", "int"), ("est_a", "dbl"), ("est_b", "dbl"),
          ("est_union", "dbl"), ("est_intersection", "dbl")]),
    ],
    "io_roundtrip_composite": [
        ("export_ordered", ["event_id"],
         [("ts_us", "int"), ("event_type", "str")]),
        ("import_dedup", ["label"], [("imported", "int")]),
        ("embedding_normalize", ["vec_id"],
         [("norm", "dbl"), ("unit_norm", "dbl")]),
        # round 15: ORC and CSV source/sink hops proven against the
        # parquet-sourced oracle (the format conversion is what's
        # under test — see queries/core.py)
        ("orc_roundtrip", ["l_returnflag"],
         [("n_rows", "int"), ("sum_qty", "dbl"), ("sum_price", "dbl"),
          ("max_ship_us", "int")]),
        ("csv_roundtrip", ["event_type"],
         [("n_rows", "int"), ("sum_ids", "int"), ("max_ts_us", "int"),
          ("min_value", "dbl"), ("max_value", "dbl"),
          ("props_chars", "int")]),
        ("xml_roundtrip", ["event_type"],
         [("n_rows", "int"), ("sum_ids", "int"), ("max_ts_us", "int"),
          ("min_value", "dbl"), ("max_value", "dbl"),
          ("props_chars", "int")]),
        ("pyds_offsetlog_roundtrip", ["event_type"],
         [("n_rows", "int"), ("sum_ids", "int"), ("max_ts_us", "int"),
          ("min_value", "dbl"), ("max_value", "dbl"),
          ("props_chars", "int")]),
    ],
}


def _melt(df: DataFrame, part: str, keys: list[str],
          vals: list[tuple[str, str]]) -> list[DataFrame]:
    kexpr = (
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys])
        if keys else None
    )
    out = []
    for col, kind in vals:
        kname = (
            F.concat(F.lit(col + ":"), kexpr) if keys else F.lit(col)
        )
        if kind == "dbl":
            v_str = F.lit(None).cast("string")
            v_num = F.col(col).cast("double")
        else:  # str / int both ride v_str (int as exact decimal string)
            v_str = F.col(col).cast("string")
            v_num = F.lit(None).cast("double")
        out.append(df.select(
            F.lit(part).alias("part"),
            kname.alias("k"),
            v_str.alias("v_str"),
            v_num.alias("v_num"),
        ))
    return out


def _make_fn(name: str):
    spec = _SPECS[name]

    def fn(spark: SparkSession, sf_dir: str) -> DataFrame:
        pieces: list[DataFrame] = []
        for part, keys, vals in spec:
            part_fn = _PARTS[part][0]
            pieces += _melt(part_fn(spark, sf_dir), part, keys, vals)
        return reduce(lambda a, b: a.unionByName(b), pieces)

    fn.__name__ = f"_{name}"
    fn.__doc__ = (
        f"Tagged-row composite of {len(spec)} long-green singles "
        f"({', '.join(p for p, _, _ in spec)}); each part's original "
        "builder and oracle arithmetic run verbatim — see module "
        "docstring for the melt contract."
    )
    return fn


def _make_oracle(name: str) -> str:
    spec = _SPECS[name]
    ctes, arms = [], []
    for i, (part, keys, vals) in enumerate(spec):
        sql = _PARTS[part][1]
        cte = f"c{i}"
        ctes.append(f"{cte} AS ({sql})")
        kexpr = (
            "concat_ws('|', "
            + ", ".join(f"CAST({k} AS VARCHAR)" for k in keys)
            + ")"
            if keys else None
        )
        for col, kind in vals:
            kname = f"'{col}:' || {kexpr}" if keys else f"'{col}'"
            if kind == "dbl":
                vs, vn = "CAST(NULL AS VARCHAR)", f"CAST({col} AS DOUBLE)"
            else:
                vs, vn = f"CAST({col} AS VARCHAR)", "CAST(NULL AS DOUBLE)"
            arms.append(
                f"SELECT '{part}' AS part, {kname} AS k, "
                f"{vs} AS v_str, {vn} AS v_num FROM {cte}"
            )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(arms)


QUERIES = {
    name: (_make_fn(name), _make_oracle(name)) for name in _SPECS
}
