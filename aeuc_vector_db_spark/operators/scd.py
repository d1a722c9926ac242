"""Slowly-changing-dimension (Type 2) history + point-in-time joins.

The training-data version of this problem is feature leakage: joining a
fact (a training example at time t) to the CURRENT value of a feature
instead of the value that was true AT t silently trains on the future.
The fix is the feature-store pattern — build versioned dimension history
once, then join each fact to the version whose validity interval covers
the fact's timestamp.

Spark-first shapes, and why they hold at 100 TB:

- `scd2_from_changes` is two window functions over ONE hash shuffle by
  the dimension key (same-instant last-wins dedup, then `lead(ts)` to
  close each version). No self-join, no collect; dimension history is
  usually orders of magnitude smaller than the fact stream.
- `point_in_time_join` is an EQUI hash join on the key with the interval
  predicate as a join filter — each fact row matches exactly one version
  (intervals are disjoint by construction), so the join output is
  |facts|, never |facts|·|versions|. Catalyst keeps the equi key as the
  hash key and evaluates the range residual per collision — the shape
  AQE can still skew-split. A pure range join (no equi key) would be the
  cartesian trap; this operator requires the key on both sides.

The reference engine has no temporal surface (it is a vector store);
this is charter scale-out surface like the manifest table. Semantics
follow the standard SCD2 / feature-store definition (Kimball DW
Toolkit ch. 5; e.g. Feast's point-in-time-correct join): versions are
half-open intervals [eff_from, eff_to), the newest version is open
(eff_to NULL), and a fact at exactly eff_from sees the NEW version.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changes(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: "list[str]",
    tie_col: str | None = None,
) -> DataFrame:
    """Build SCD Type-2 history from a change stream.

    Each input row is "key's attributes became these values at ts".
    Output: one row per version with half-open validity
    ``[eff_from, eff_to)``; the latest version per key has
    ``eff_to = NULL``.

    Same-instant changes (two updates sharing (key, ts)) keep the row
    with the greatest `tie_col` — a deterministic last-wins; without a
    tie column, same-instant duplicates are rejected loudly rather than
    resolved arbitrarily (partition order must never pick the winner).
    """
    required = (key_col, ts_col, *attr_cols) + ((tie_col,) if tie_col else ())
    for c in required:
        if c not in changes.columns:
            raise ValueError(f"scd2_from_changes: no column {c!r} in changes")
    if tie_col is not None:
        w_tie = Window.partitionBy(key_col, ts_col).orderBy(F.col(tie_col).desc())
        deduped = (
            changes.withColumn("__rn__", F.row_number().over(w_tie))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )
    else:
        # No tie-break requested: a same-instant duplicate would make the
        # version order depend on partition order — raise AT EVALUATION,
        # distributed, as a FILTER predicate. A filter condition is not
        # subject to column pruning (an earlier version embedded the
        # raise in the eff_from projection, which Catalyst eliminated
        # whenever the consumer never read eff_from — silently emitting
        # overlapping duplicate versions), and it cannot be pushed below
        # its own window because it references the window's output.
        w_dup = Window.partitionBy(key_col, ts_col)
        deduped = (
            changes.withColumn("__dup__", F.count(F.lit(1)).over(w_dup))
            .filter(
                F.when(
                    F.col("__dup__") > 1,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "scd2_from_changes: same-instant duplicate "
                                f"change for {key_col}="
                            ),
                            F.col(key_col).cast("string"),
                            F.lit(" — pass tie_col for deterministic last-wins"),
                        )
                    ).cast("boolean"),
                ).otherwise(F.lit(True))
            )
            .drop("__dup__")
        )
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col).asc())
    return deduped.select(
        F.col(key_col),
        F.col(ts_col).alias("eff_from"),
        F.lead(ts_col).over(w).alias("eff_to"),
        *[F.col(c) for c in attr_cols],
    )


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str,
    how: str = "left",
    bucket_seconds: int | None = None,
    horizon_ts=None,
) -> DataFrame:
    """Join each fact to the dimension version valid at the fact's time.

    `dim` must carry `eff_from`/`eff_to` (from `scd2_from_changes`).
    The join is equi on `key_col` with the interval predicate as a join
    filter; intervals are disjoint per key, so each fact matches at most
    one version. `how='left'` keeps facts that predate the first version
    (dimension columns NULL) — the honest answer for training data,
    where dropping early facts silently shifts the distribution.

    **Hot-key skew** (`bucket_seconds`): the plain equi join's per-probe
    cost is the number of versions under the probed key — an entity with
    10⁵ versions makes every fact on it scan all 10⁵ interval residuals
    (measured 11× over uniform at 1M facts / 100k hot versions, PLANS.md
    round-8 soak). Passing `bucket_seconds` chunks TIME into the join
    key: the fact side buckets `floor(ts / bucket_seconds)` and each
    version explodes to the buckets its interval covers, so the equi key
    becomes (key, time_bucket) and per-probe collisions shrink to the
    versions overlapping ONE bucket. Open versions (eff_to NULL) explode
    up to `horizon_ts` (any value ≥ the max fact timestamp; derived with
    one scalar aggregate over facts when omitted — pass it explicitly at
    scale to skip that pass; a supplied value below the max fact
    timestamp raises at evaluation rather than silently unmatching the
    facts beyond it). Size the knob so a bucket holds few
    versions but a version spans few buckets — e.g. versions changing
    ~hourly → bucket_seconds=86400 gives ≤24 collisions and ~1-bucket
    explode. Results are identical to the unbucketed plan (parity pinned
    in test_scd.py).
    """
    if how not in ("left", "inner"):
        raise ValueError(f"point_in_time_join: how must be left|inner, got {how!r}")
    missing = [c for c in ("eff_from", "eff_to") if c not in dim.columns]
    if missing:
        raise ValueError(f"point_in_time_join: dim lacks {missing} (build it "
                         "with scd2_from_changes)")
    if key_col not in facts.columns:
        raise ValueError(f"point_in_time_join: no column {key_col!r} in facts")
    if key_col not in dim.columns:
        raise ValueError(f"point_in_time_join: no column {key_col!r} in dim")
    # Overlapping non-key column names would survive the join as duplicate
    # columns and break every downstream select-by-name; fail loudly here
    # (the caller renames or prefixes dim attributes).
    overlap = sorted(
        (set(facts.columns) & set(dim.columns)) - {key_col}
    )
    if overlap:
        raise ValueError(
            "point_in_time_join: facts and dim share non-key columns "
            f"{overlap} — rename or prefix the dim attributes first"
        )
    dim_key = f"__dim_{key_col}__"
    if bucket_seconds is None:
        d = dim.withColumnRenamed(key_col, dim_key)
        key_cond = facts[key_col] == d[dim_key]
        ts = facts[fact_ts_col]
        cond = (
            key_cond
            & (ts >= d["eff_from"])
            & (d["eff_to"].isNull() | (ts < d["eff_to"]))
        )
        return facts.join(d, cond, how).drop(dim_key)

    if bucket_seconds <= 0:
        raise ValueError("point_in_time_join: bucket_seconds must be positive")
    size_us = int(bucket_seconds) * 1_000_000
    horizon_supplied = horizon_ts is not None
    if horizon_ts is None:
        horizon_ts = facts.agg(F.max(fact_ts_col)).first()[0]
    if horizon_ts is None:  # empty fact side: nothing can match
        horizon_b = F.lit(0)
    else:
        horizon_b = F.floor(
            F.unix_micros(F.lit(horizon_ts).cast("timestamp")) / size_us
        )
    # Each version row fans out to every bucket its half-open interval
    # covers: [floor(from/size), floor((to-1)/size)] — the -1 keeps an
    # eff_to landing exactly on a bucket boundary out of the next bucket.
    # Open versions fan out to the horizon. The per-key fan-out replaces
    # per-probe collision scans; the exploded dim stays
    # |versions| × (avg interval span / bucket) rows.
    b_from = F.floor(F.unix_micros("eff_from") / size_us)
    b_to = F.when(
        F.col("eff_to").isNotNull(),
        F.floor((F.unix_micros("eff_to") - 1) / size_us),
    ).otherwise(horizon_b)
    d = (
        dim.withColumnRenamed(key_col, dim_key)
        .withColumn(
            "__pit_bucket__",
            F.explode(F.sequence(b_from, F.greatest(b_to, b_from))),
        )
    )
    fb = facts.withColumn(
        "__pit_bucket__", F.floor(F.unix_micros(F.col(fact_ts_col)) / size_us)
    )
    if horizon_supplied:
        # The docstring promises parity with the unbucketed plan, but a
        # user-supplied horizon below the max fact timestamp would
        # silently unmatch later facts against open (eff_to NULL)
        # versions — their bucket would lie beyond the open versions'
        # explode range. Validate the contract where it's free: as a
        # filter predicate riding the existing fact scan (no extra
        # aggregate pass), raising AT EVALUATION on the first violating
        # row. A filter is not subject to column pruning, so Catalyst
        # cannot eliminate the check (same hazard as scd2's dup guard).
        fb = fb.filter(
            F.when(
                F.col("__pit_bucket__") > horizon_b,
                F.raise_error(
                    F.concat(
                        F.lit(
                            "point_in_time_join: fact timestamp "
                        ),
                        F.col(fact_ts_col).cast("string"),
                        F.lit(
                            " exceeds the supplied horizon_ts "
                            f"{horizon_ts} — facts beyond the horizon "
                            "would silently miss open versions; pass a "
                            "horizon_ts >= max fact timestamp"
                        ),
                    )
                ).cast("boolean"),
            ).otherwise(F.lit(True))
        )
    ts = fb[fact_ts_col]
    cond = (
        (fb[key_col] == d[dim_key])
        & (fb["__pit_bucket__"] == d["__pit_bucket__"])
        & (ts >= d["eff_from"])
        & (d["eff_to"].isNull() | (ts < d["eff_to"]))
    )
    return fb.join(d, cond, how).drop(d["__pit_bucket__"]).drop(
        dim_key
    ).drop("__pit_bucket__")
