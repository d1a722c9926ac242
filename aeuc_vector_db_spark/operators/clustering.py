"""Clustering operators (reference parity: A8-A12, clustering.py + vector_field.py).

- centroid:   element-wise mean of member embeddings (clustering.py:25-29)
- inertia:    Σ‖e − c‖² within each cluster (clustering.py:32-34)
- form_pglyphs: centroid + inertia + member digest per group
  (clustering.py:42-79); surrogate id is sha2 over the sorted member id
  list instead of uuid4 (clustering.py:71) so results are reproducible.
- phi_partition: split rows into φ-scaled L2-norm bands
  (clustering.py:87-127) — breaks at min + span·(1 − 1/φᵏ), span padded
  +1e-12, top edge +1e-9, half-open [lo, hi).
- auto_cluster_phi: filter(ctx) → band → one PGlyph per non-empty band,
  tagged phi_band_{i} (vector_field.py:351-390).

Scale notes:
- The centroid uses posexplode → groupBy(cluster, pos) → avg. Partial
  (map-side) aggregation means shuffle volume is #clusters × dim rows, not
  #rows × dim. Reassembly sorts by position explicitly — collect_list
  alone is order-nondeterministic under parallelism.
- Inertia joins members back to their (broadcast) centroids — the big side
  never shuffles.
- phi_partition's global min/max is a 2-scalar aggregate crossJoined back
  (broadcast), not a collect(): the pipeline stays lazy end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from aeuc_vector_db_spark.functions.similarity import PHI
from aeuc_vector_db_spark.functions.vector import as_double, l2_norm_col


def centroids(
    df: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group element-wise mean vector (A8). Output: group_cols + centroid."""
    exploded = df.select(
        *group_cols, F.posexplode(as_double(vec_col)).alias("__pos__", "__val__")
    )
    per_dim = exploded.groupBy(*group_cols, "__pos__").agg(F.avg("__val__").alias("__avg__"))
    return per_dim.groupBy(*group_cols).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("__pos__", "__avg__"))),
            lambda s: s["__avg__"],
        ).alias("centroid")
    )


def inertia(
    df: DataFrame,
    cents: DataFrame,
    group_cols: list[str],
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group Σ‖e − c‖² (A9). cents: output of centroids()."""
    joined = df.join(F.broadcast(cents), group_cols, "inner")
    sq = F.aggregate(
        F.zip_with(as_double(vec_col), F.col("centroid"), lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda s, x: s + x,
    )
    return joined.groupBy(*group_cols).agg(F.sum(sq).alias("inertia"))


def form_pglyphs(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    materialize: bool = False,
) -> DataFrame:
    """Form one PGlyph row per group (A10): deterministic pglyph_id =
    sha2(sorted member ids), centroid, inertia, member_count.

    Output: group_cols + (pglyph_id, centroid, inertia, member_count).

    FUSED single-scan plan: one posexplode → one (group, pos) aggregate
    carrying avg, Σx², count, AND the member-id digest (collected only at
    pos 0 — `when(pos=0, id)` nulls elsewhere, collect_list drops nulls),
    then one group-level aggregate reassembling the centroid and summing
    per-dim inertia via the algebraic identity Σ(x−c)² = Σx² − n·c².
    Two shuffles total (both keyed narrower than the data), no join, no
    persist — the previous 3-pass + broadcast-join shape cost 2× the
    jobs and needed a persist to avoid re-running upstream per pass.
    The `materialize` parameter is retained for API compatibility and
    ignored (single-scan plans have nothing to re-run).

    Numeric note: the algebraic inertia differs from the subtract-then-
    square form only in low-order float bits (means are O(1), no
    catastrophic cancellation for embedding-like data); declared queries
    round inertia to 6 dp and their oracles use the same algebraic form.

    Rows with NULL/empty embeddings are excluded EXPLICITLY (posexplode
    would drop them from the digest silently while membership() kept
    them, desynchronizing pglyph_id between the two — see membership()'s
    matching filter). Validated pipelines never carry such rows anyway.
    """
    df = df.filter(F.size(as_double(vec_col)) > 0)
    exploded = df.select(
        *group_cols,
        F.col(id_col),
        F.posexplode(as_double(vec_col)).alias("__pos__", "__val__"),
    )
    per_dim = exploded.groupBy(*group_cols, "__pos__").agg(
        F.avg("__val__").alias("__avg__"),
        F.sum(F.col("__val__") * F.col("__val__")).alias("__ss__"),
        F.count(F.lit(1)).alias("__n__"),
        F.sha2(
            F.concat_ws(
                ",",
                F.sort_array(
                    F.collect_list(
                        F.when(F.col("__pos__") == 0, F.col(id_col).cast("string"))
                    )
                ),
            ),
            256,
        ).alias("__digest__"),
    )
    return (
        per_dim.groupBy(*group_cols)
        .agg(
            F.max(F.when(F.col("__pos__") == 0, F.col("__digest__"))).alias("pglyph_id"),
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos__", "__avg__"))),
                lambda s: s["__avg__"],
            ).alias("centroid"),
            F.sum(
                F.col("__ss__") - F.col("__n__") * F.col("__avg__") * F.col("__avg__")
            ).alias("inertia"),
            F.max("__n__").alias("member_count"),
        )
        .select(*group_cols, "pglyph_id", "centroid", "inertia", "member_count")
    )


def membership(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Normalized (pglyph_id, member id) relation — replaces the reference's
    mutable member_ids list / proto_id back-pointer (vector_field.py:256-257).

    Applies the same NULL/empty-embedding filter as form_pglyphs so both
    derive the pglyph_id digest from the identical member set."""
    df = df.filter(F.size(as_double(vec_col)) > 0)
    ids = df.groupBy(*group_cols).agg(
        F.sha2(
            F.concat_ws(",", F.sort_array(F.collect_list(F.col(id_col).cast("string")))), 256
        ).alias("pglyph_id")
    )
    return df.join(F.broadcast(ids), group_cols, "inner").select(
        "pglyph_id", F.col(id_col).alias("iglyph_id")
    )


def _phi_break_fracs(levels: int) -> list[float]:
    """Interior break fractions 1 − 1/φᵏ, k = 1..levels−1 (clustering.py:116-117).

    Computed once in Python; folded into the plan as double literals so the
    Spark expression and the DuckDB oracle share the exact same doubles.
    """
    return [1.0 - 1.0 / (PHI**k) for k in range(1, levels)]


def with_phi_band(
    df: DataFrame,
    levels: int = 3,
    vec_col: str = "embedding",
    band_col: str = "band",
) -> DataFrame:
    """Assign each row its φ-band index (A11, clustering.py:87-127).

    Two-pass shape: (1) 2-scalar min/max aggregate over the norms,
    broadcast-crossJoined back; (2) CASE WHEN banding. Half-open bands
    [breaks[i], breaks[i+1]) with span +1e-12 and top edge +1e-9 —
    exactly the reference's edge semantics.
    """
    with_norm = df.withColumn("__norm__", l2_norm_col(as_double(vec_col)))
    minmax = with_norm.agg(
        F.min("__norm__").alias("__min_n__"), F.max("__norm__").alias("__max_n__")
    )
    j = with_norm.crossJoin(F.broadcast(minmax))
    span = F.col("__max_n__") - F.col("__min_n__") + F.lit(1e-12)

    # breaks[0]=min, breaks[k]=min+span*frac_k, breaks[levels]=max+1e-9
    fracs = _phi_break_fracs(levels)
    band: Column = F.lit(levels - 1)  # last band: norm < max+1e-9 always holds
    for i in range(levels - 2, -1, -1):
        upper = F.col("__min_n__") + span * F.lit(fracs[i])
        band = F.when(F.col("__norm__") < upper, F.lit(i)).otherwise(band)

    return j.withColumn(band_col, band).drop("__min_n__", "__max_n__").withColumnRenamed(
        "__norm__", "norm"
    )


def auto_cluster_phi(
    df: DataFrame,
    outer_context_id: int | None = None,
    levels: int = 3,
    ctx_col: str = "outer_context_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """φ-partitioned auto-clustering (A12, vector_field.py:351-390).

    One lazy pipeline: filter(ctx) → norm/band → form_pglyphs per band.
    Output rows carry cluster_tag = 'phi_band_{i}' (vector_field.py:387).
    Empty bands simply produce no row (reference skips them too).
    """
    scoped = df if outer_context_id is None else df.filter(
        F.col(ctx_col) == F.lit(outer_context_id)
    )
    banded = with_phi_band(scoped, levels=levels, vec_col=vec_col)
    pg = form_pglyphs(banded, ["band"], id_col=id_col, vec_col=vec_col)
    return pg.withColumn(
        "cluster_tag", F.concat(F.lit("phi_band_"), F.col("band").cast("string"))
    )
