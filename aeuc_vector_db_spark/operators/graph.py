"""Graph operators over edge-list DataFrames (charter extension —
SURVEY.md §2.C: the reference, a 983-line in-memory vector store, has
no graph surface; connected components already lives in
`operators/dedup.py` as the dedup-cluster primitive, and this module
adds the ranking side).

Determinism-by-construction: PageRank is usually float and therefore
order-dependent under partial aggregation. `integer_pagerank` runs the
ENTIRE iteration in exact integer arithmetic — ranks are integers at a
fixed SCALE, per-edge contributions are integer floor divisions, and
sums of integers are order-independent — so the result is bit-identical
across any partitioning, any engine (the DuckDB oracle unrolls the same
iterations), and any run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def integer_pagerank(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 1_000_000_000_000,
    damp_num: int = 85,
    damp_den: int = 100,
    checkpoint: bool = True,
) -> DataFrame:
    """Fixed-iteration PageRank in exact integer arithmetic.

    `edges` is a DIRECTED edge list with columns (src, dst) — pass both
    directions for an undirected graph. An optional integer `weight`
    column switches to the weighted update (contribution proportional
    to w(u→v)/W(u), W(u) = Σ out-weights, still all-integer; duplicate
    (src, dst) rows sum). Ranks start at `scale` per node; each
    iteration computes

        rank'(v) = floor(scale·(damp_den−damp_num)/damp_den)
                 + Σ_{u→v} floor(damp_num·rank(u) / (damp_den·deg(u)))

    i.e. the standard damped update with every operation an integer
    floor division (`div` in Spark ≡ `//` in DuckDB on non-negative
    values), so results are order-independent and cross-engine exact.
    Mass lost to flooring is deterministic rounding, not error — this
    computes a specific integer recurrence, the same one the oracle
    unrolls.

    Scale shape: each iteration is ONE equi-join of the edge list with
    the current rank table on src (rank tables are #nodes rows — at
    web scale both sides shuffle on the node key; with few iterations
    the rank side is often broadcastable) plus one map-side-combining
    SUM shuffle keyed by dst. The loop-invariant tables (edges, deg,
    nodes) are eagerly localCheckpoint-ed by default — every iteration
    references them, and lazy lineage would re-derive the caller's
    edge construction once per reference (measured 3.7 s → 1.1 s warm
    on the fixture trade graph; same precedent as doc_pipeline_e2e's
    iterative connected components). Pass checkpoint=False to keep the
    plan fully lazy. For iters ≫ 5 at cluster scale, additionally
    checkpoint `ranks` per iteration to cut the growing join lineage.

    Overflow bound (documented contract): the total mass stays ≈
    #nodes·scale, and the update multiplies a rank by `damp_num`, so
    callers must keep damp_num·#nodes·scale < 2⁶³ — at 10⁸ nodes use
    scale ≤ 10⁹. The fixture default (10¹² at ≤10⁵ nodes) has 50×
    headroom. Violations fail LOUD, not wrong: Spark's ANSI mode
    (default) raises on long overflow — verified empirically at 10⁶
    nodes × 10¹² scale (PLANS.md round-9 soaks; 10⁹ runs clean there,
    1.73M nodes / 4M edges / 3 iters in 12.5 s).
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    if not (0 < damp_num < damp_den):
        raise ValueError(f"need 0 < damp_num < damp_den, got {damp_num}/{damp_den}")
    weighted = "weight" in edges.columns
    if weighted:
        # weighted update: floor(damp_num·r(u)·w(u→v) / (damp_den·W(u)))
        # with W(u) = Σ out-weights — still all-integer, still exact;
        # duplicate (src, dst) rows sum into one edge weight. Overflow
        # bound tightens to damp_num·max_w·#nodes·scale < 2⁶³.
        e = edges.groupBy("src", "dst").agg(
            F.sum(F.col("weight").cast("long")).alias("w")
        )
        contrib_expr = f"({damp_num} * rank * w) div ({damp_den} * deg)"
    else:
        e = edges.select(
            F.col("src").alias("src"), F.col("dst").alias("dst")
        ).distinct()
        contrib_expr = f"({damp_num} * rank) div ({damp_den} * deg)"
    # Checkpoint the DEDUPED EDGE SET first, then derive deg/nodes/ed
    # FROM the materialization (optimization round 15): the previous
    # order checkpointed `ed` and `nodes` as two independent subtrees,
    # so the caller's whole edge construction (join + distinct + union)
    # executed TWICE — measured 9.7 s of checkpoint time vs 2.6 s for
    # the three iterations themselves on the sf0.1 trade graph; deriving
    # from the e-checkpoint cut it to one caller-pipeline pass. Same
    # integer recurrence over the same edge set — results unchanged.
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    deg = (
        e.groupBy("src").agg(F.sum("w").alias("deg"))
        if weighted
        else e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    base = (scale * (damp_den - damp_num)) // damp_den
    ed = e.join(deg, "src")
    if checkpoint:
        ed = ed.localCheckpoint(eager=True)
        nodes = nodes.localCheckpoint(eager=True)
    ranks = nodes.select("node", F.lit(scale).cast("long").alias("rank"))
    for _ in range(iters):
        contrib = ed.join(ranks, ed["src"] == ranks["node"]).select(
            F.col("dst").alias("node"),
            F.expr(contrib_expr).alias("c"),
        )
        recv = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = nodes.join(recv, "node", "left").select(
            "node",
            (F.lit(base) + F.coalesce(F.col("s"), F.lit(0)))
            .cast("long")
            .alias("rank"),
        )
    return ranks
