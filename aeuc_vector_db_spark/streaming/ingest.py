"""Structured Streaming ingest for VectorEntry records (SURVEY.md §2.B
streaming row; reference types.py:7,31 — "for streaming / bulk use").

The reference only gestures at streaming (VectorEntry is exported but
never consumed, types.py:7). Here it becomes a real pipeline:

    file/kafka source → explicit schema → watermark(ts) →
    validate (A24 predicates) → foreachBatch: dedup-append + audit

Design points that carry to a real cluster:
- `readStream` with an explicit schema (never inference on a stream).
- Watermark on `ts` bounds state for any downstream windowed aggs and
  defines the late-data cutoff.
- Validation splits the batch into accepted/quarantined instead of
  failing the stream — bad rows land in a quarantine sink with the
  reason attached (the streaming analog of import_jsonl's silent-skip,
  made observable).
- `foreachBatch` gives exactly-once-per-epoch batch semantics for the
  dedup-append (left_anti against the current corpus) using the same
  batch operators as the rest of the engine — one code path for batch
  and streaming (the kappa-architecture property Structured Streaming
  is built around).
- Windowed aggregation with watermark (event-time tumbling windows) and
  session windows are exposed as plan builders usable in BOTH batch and
  streaming mode — identical semantics, which is what makes them
  oracle-checkable in batch and reusable on the stream.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from aeuc_vector_db_spark import schemas


def read_vector_entry_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """File-source stream of VectorEntry JSONL with event-time watermark."""
    reader = (
        spark.readStream.schema(schemas.VECTOR_ENTRY_SCHEMA)
        .option("multiLine", "false")
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path).withWatermark("ts", watermark)


def split_valid(entries: DataFrame, dim: int) -> tuple[DataFrame, DataFrame]:
    """(accepted, quarantined): A24 validation as a stream-safe split.

    Quarantined rows keep a `reject_reason` so the quarantine sink is
    auditable — the observable version of the reference's silent skip
    (vector_field.py:439-440).
    """
    # coalesce(pred, False): a NULL predicate (corrupt line → null fields)
    # must land in quarantine, not vanish — filter(pred) and filter(~pred)
    # BOTH drop NULL rows otherwise (three-valued logic).
    pred = F.coalesce(schemas.valid_row(dim), F.lit(False))
    accepted = entries.filter(pred)
    # Reason labels must distinguish "field is NULL" (corrupt/missing JSON
    # line) from "field fails its range check": without the leading branch,
    # coalesce(pred, False) would tag every null-field row with the first
    # range label, misdirecting quarantine triage.
    quarantined = entries.filter(~pred).withColumn(
        "reject_reason",
        F.when(
            F.col("glyph_id").isNull()
            | F.col("outer_context_id").isNull()
            | F.col("embedding").isNull(),
            F.lit("null_fields"),
        )
        .when(~schemas.valid_glyph_id("glyph_id"), F.lit("glyph_id_range"))
        .when(~schemas.valid_outer_context("outer_context_id"), F.lit("ctx_range"))
        .otherwise(F.lit("embedding_dim_or_nan")),
    )
    return accepted, quarantined


#: default id-bucket fan-out for the corpus layout. Sized so a micro-batch
#: of B distinct ids reads at most min(B, N_ID_BUCKETS)/N_ID_BUCKETS of
#: the corpus for its dedup anti-join; at 100 TB raise it (buckets are
#: directories — cheap) so each bucket stays executor-memory-sized.
N_ID_BUCKETS = 64


def id_bucket_col(id_col: str = "entry_id", n_buckets: int = N_ID_BUCKETS):
    """Stable id → bucket mapping (xxhash64, engine-internal only — never
    compared cross-engine, so no polyhash needed)."""
    return F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_buckets)).cast("int")


#: Layout-marker filename. Leading underscore ⇒ Spark's parquet reader
#: skips it (same convention as _SUCCESS/_metadata), so it can live
#: inside the corpus directory.
LAYOUT_MARKER = "_layout.json"


def write_layout_marker(corpus_path: str, n_buckets: int) -> None:
    """Record the id-bucket fan-out the corpus was written with.

    n_buckets is part of the on-disk layout: a restart with a different
    value would prune the WRONG id_bucket partitions and silently append
    duplicate ids. The marker turns that misconfiguration into a loud
    error (enforce_layout). Local-FS file IO here; a cloud deployment
    would go through the Hadoop FileSystem API for s3://'hdfs:// paths.
    """
    import json as _json
    import os as _os

    with open(_os.path.join(corpus_path, LAYOUT_MARKER), "w") as fh:
        _json.dump({"n_buckets": int(n_buckets), "version": 1}, fh)


def read_layout_marker(corpus_path: str) -> int | None:
    """The recorded n_buckets, or None if no marker exists (legacy corpus)."""
    import json as _json
    import os as _os

    p = _os.path.join(corpus_path, LAYOUT_MARKER)
    if not _os.path.exists(p):
        return None
    with open(p) as fh:
        return int(_json.load(fh)["n_buckets"])


def enforce_layout(
    base: DataFrame, corpus_path: str, n_buckets: int, id_col: str
) -> None:
    """Raise if `n_buckets` disagrees with the corpus's actual layout.

    Marker present → exact comparison. Marker absent (corpus written
    before markers existed) → recompute the bucket for a bounded sample
    of existing rows and compare against the stored id_bucket; on
    success, backfill the marker so later restarts get the cheap path.
    """
    recorded = read_layout_marker(corpus_path)
    if recorded is not None:
        if recorded != n_buckets:
            raise ValueError(
                f"n_buckets={n_buckets} does not match the corpus layout at "
                f"{corpus_path!r} (written with n_buckets={recorded}); "
                "restarting ingest with a different fan-out would prune the "
                "wrong partitions and silently append duplicate ids"
            )
        return
    sample_bad = (
        base.select(id_col, "id_bucket")
        .limit(1000)
        .filter(id_bucket_col(id_col, n_buckets) != F.col("id_bucket"))
        .limit(1)
        .count()
    )
    if sample_bad:
        raise ValueError(
            f"n_buckets={n_buckets} is inconsistent with the id_bucket values "
            f"already stored at {corpus_path!r} (no layout marker; sampled "
            "rows re-bucket differently). Re-run with the fan-out the corpus "
            "was created with."
        )
    write_layout_marker(corpus_path, n_buckets)


def pruned_existing_ids(
    spark: SparkSession,
    corpus_path: str,
    buckets: list[int],
    id_col: str = "entry_id",
) -> DataFrame:
    """The ids already in the corpus, reading ONLY the id-bucket
    partitions in `buckets` — the scan carries
    `PartitionFilters: [id_bucket IN (...)]` (asserted in
    tests/test_streaming.py), so per-epoch dedup cost is bounded by the
    batch's bucket fan-out, not the corpus size."""
    return (
        spark.read.parquet(corpus_path)
        .filter(F.col("id_bucket").isin([int(b) for b in buckets]))
        .select(id_col)
    )


def start_ingest(
    spark: SparkSession,
    source_path: str,
    corpus_path: str,
    quarantine_path: str,
    checkpoint_path: str,
    dim: int,
    id_col: str = "entry_id",
    available_now: bool = False,
    n_buckets: int = N_ID_BUCKETS,
) -> StreamingQuery:
    """Validated, deduplicating streaming append into a parquet corpus.

    Each epoch: validate → split → PK-dedup the accepted rows against
    the corpus → append; quarantined rows append to their own sink.
    Restarts resume from the checkpoint (file-source offsets + epoch id).

    The corpus is laid out partitioned by a stable id bucket
    (pmod(xxhash64(id), n_buckets)), and each epoch's anti-join reads
    only the buckets the batch touches (partition pruning). Without
    this, the dedup scan is O(corpus) per micro-batch — a real
    scale-killer at 100 TB; with it, per-epoch cost is proportional to
    (touched buckets / n_buckets) × corpus, bounded by the batch size.

    n_buckets is part of the corpus layout: it must stay FIXED for the
    lifetime of a corpus (changing it re-maps ids to different buckets
    and breaks pruned dedup for pre-existing rows). The fan-out is
    recorded in a `_layout.json` marker at corpus creation and enforced
    every epoch (enforce_layout) — a restart with a different value
    raises instead of silently appending duplicates. A corpus written by
    the pre-bucket layout is detected (no id_bucket column) and handled
    with a correct-but-unpruned full anti-join plus flat appends.
    """
    stream = read_vector_entry_stream(spark, source_path)

    def process_batch(batch: DataFrame, epoch_id: int) -> None:
        from pyspark.errors import AnalysisException

        accepted, quarantined = split_valid(batch, dim)
        accepted = accepted.dropDuplicates([id_col]).withColumn(
            "id_bucket", id_bucket_col(id_col, n_buckets)
        )
        # small local materialization: ≤ n_buckets ints + the batch rows
        # (micro-batches are bounded by maxFilesPerTrigger upstream)
        accepted = accepted.localCheckpoint(eager=True)
        # the ONLY condition the try may swallow is "corpus doesn't exist
        # yet" (PATH_NOT_FOUND); any other AnalysisException — e.g.
        # UNABLE_TO_INFER_SCHEMA from a corpus directory whose parquet
        # files were lost, schema drift, permissions — must surface: a
        # swallowed dedup failure means silent duplicates appended over
        # a corpus that DOES exist
        try:
            base = spark.read.parquet(corpus_path)
        except AnalysisException as exc:
            if exc.getErrorClass() != "PATH_NOT_FOUND":
                raise
            base = None  # first epoch
        bucketed = base is None or "id_bucket" in base.columns
        if base is not None:
            if bucketed:
                enforce_layout(base, corpus_path, n_buckets, id_col)
                buckets = [
                    r["id_bucket"]
                    for r in accepted.select("id_bucket").distinct().collect()
                ]
                existing = base.filter(
                    F.col("id_bucket").isin([int(b) for b in buckets])
                ).select(id_col)
            else:
                # legacy flat corpus (pre-bucket layout): dedup stays
                # CORRECT via a full-scan anti-join, just unbounded —
                # and we must keep appending flat: mixing partitioned
                # subdirectories into a flat layout corrupts the dataset
                existing = base.select(id_col)
            accepted = accepted.join(existing, id_col, "left_anti")
        if bucketed:
            accepted.write.mode("append").partitionBy("id_bucket").parquet(corpus_path)
            if base is None:
                # first epoch created the corpus: pin its layout so any
                # restart with a different n_buckets fails loudly instead
                # of silently double-inserting (enforce_layout docstring)
                write_layout_marker(corpus_path, n_buckets)
        else:
            accepted.drop("id_bucket").write.mode("append").parquet(corpus_path)
        if quarantined.limit(1).count() > 0:
            quarantined.write.mode("append").parquet(quarantine_path)

    writer = stream.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_path
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# ---------------------------------------------------------------------------
# Event-time windowed aggregation plan builders (batch ≡ streaming)
# ---------------------------------------------------------------------------

def hourly_window_counts(events: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Tumbling 1-hour event-time windows: counts + value sums per type.

    In streaming mode, chain .withWatermark(ts_col, ...) upstream and the
    same plan runs incrementally with bounded state; in batch mode it is
    an ordinary groupBy — identical results, which the DuckDB oracle
    checks (queries/streaming_q.py).
    """
    return (
        events.groupBy(F.window(F.col(ts_col), "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("_sv"),
        )
        .select(
            F.unix_micros(F.col("w.start")).alias("window_start_us"),
            "event_type",
            "n_events",
            F.col("_sv").cast("double").alias("sum_value"),
        )
    )


def running_counts_stateful(
    entries: DataFrame,
    key_col: str = "glyph_id",
    ts_col: str = "ts",
    timeout_minutes: int | None = None,
):
    """Custom stateful operator: running per-key totals across micro-batches
    via applyInPandasWithState (arbitrary stateful processing — the escape
    hatch when built-in windowed aggs can't express the semantics).

    State per key: (total_count, last_seen epoch seconds). Each
    micro-batch emits one row per touched key with the UPDATED running
    total — the streaming analog of a continuously-maintained stats
    table. State is bounded by key cardinality; with a timeout it
    self-expires idle keys (timeout requires a watermark upstream).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "key long, total_count long, last_seen_s long"
    state_schema = "total long, last_s long"

    def update(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            # idle key expired: drop state, emit nothing — the bounded-
            # state contract the timeout parameter exists for
            state.remove()
            return
        total, last_s = state.get if state.exists else (0, 0)
        for pdf in pdfs:
            total += len(pdf)
            if len(pdf):
                ts_max = pdf[ts_col].max()
                last_s = max(last_s, int(ts_max.timestamp()))
        state.update((total, last_s))
        if timeout_minutes:
            # expire this key once the event-time watermark passes
            # last-seen + timeout
            state.setTimeoutTimestamp((last_s + timeout_minutes * 60) * 1000)
        yield pd.DataFrame({"key": [key[0]], "total_count": [total], "last_seen_s": [last_s]})

    timeout = (
        GroupStateTimeout.EventTimeTimeout if timeout_minutes else GroupStateTimeout.NoTimeout
    )
    return entries.groupBy(F.col(key_col)).applyInPandasWithState(
        update, out_schema, state_schema, "update", timeout
    )


def user_sessions(
    events: DataFrame, gap: str = "30 minutes", ts_col: str = "ts"
) -> DataFrame:
    """Session windows per user: events within `gap` of each other merge.

    Uses session_window (stateful merging windows in streaming; plain agg
    in batch). Output: user_id, session_start_us, n_events.
    """
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            "n_events",
        )
    )


def attribute_clicks(
    impressions: DataFrame,
    clicks: DataFrame,
    max_delay: str = "1 hour",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join with event-time bounds: attribute each
    click to the impression it followed within `max_delay`, per
    (user_id, ad_id).

    Both sides are watermarked, and the join condition carries the time
    range `imp_ts <= click_ts <= imp_ts + max_delay` — together these
    bound the join state Spark must keep: an impression's state is
    evictable once the watermark passes imp_ts + max_delay, and a click
    older than the watermark is dropped as late instead of growing state
    forever. Without the time bound, stream-stream join state is
    unbounded and the query is rejected for append mode — the range IS
    the scale contract. Works identically as a plain batch range join
    (batch ≡ streaming, checked in tests).
    """
    imp = impressions.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("ad_id"),
        F.col("ts").alias("imp_ts"),
    )
    clk = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ad_id").alias("c_ad"),
        F.col("ts").alias("click_ts"),
    )
    joined = imp.join(
        clk,
        (imp["user_id"] == clk["c_user"])
        & (imp["ad_id"] == clk["c_ad"])
        & (clk["click_ts"] >= imp["imp_ts"])
        & (clk["click_ts"] <= imp["imp_ts"] + F.expr(f"INTERVAL {max_delay}")),
        "inner",
    )
    return joined.select(
        "user_id",
        "ad_id",
        F.unix_micros("imp_ts").alias("imp_ts_us"),
        F.unix_micros("click_ts").alias("click_ts_us"),
        (F.unix_micros("click_ts") - F.unix_micros("imp_ts")).alias("delay_us"),
    )


def _constraint_split(table, accepted: DataFrame, quarantined: DataFrame):
    """Route declared-CHECK-constraint violators to quarantine (SQL CHECK
    semantics: NULL passes). Shared by manifest_sink and
    bucketed_manifest_sink — a schema invariant the TABLE declares is a
    per-row data-quality verdict in a stream; failing the whole epoch
    would wedge the query on one bad record."""
    cons = table.constraints() if table.latest_version() is not None else {}
    if not cons:
        return accepted, quarantined
    ok = None
    for _cname, _cexpr in sorted(cons.items()):
        term = F.coalesce(F.expr(_cexpr), F.lit(True))
        ok = term if ok is None else (ok & term)
    violators = accepted.filter(~ok).withColumn(
        "reject_reason",
        F.lit("check_constraint:" + ",".join(sorted(cons))),
    )
    return accepted.filter(ok), quarantined.unionByName(violators)


def _write_quarantine(
    quarantined: DataFrame, quarantine_path: str | None, epoch_id: int
) -> None:
    """Exactly-once quarantine: epoch-scoped overwrite, so an epoch
    replay rewrites the same rows into the same directory instead of
    duplicating them (readers load the root; partition discovery
    exposes epoch_id as a column)."""
    import os

    if quarantine_path is not None and quarantined.limit(1).count() > 0:
        quarantined.write.mode("overwrite").parquet(
            os.path.join(quarantine_path, f"epoch_id={epoch_id}")
        )


def manifest_sink(table, dim: int, quarantine_path: str | None = None):
    """foreachBatch body: validated, EXACTLY-ONCE append into a
    transactional ManifestTable (sources/manifest.py).

    Exactly-once here needs no corpus scan at all: Structured Streaming
    replays a failed epoch with the SAME epoch_id, and
    `commit_append(epoch_id=...)` absorbs the duplicate delivery in the
    log — the idempotent-sink half of the end-to-end guarantee. Compare
    `start_ingest`, whose plain-parquet corpus must anti-join per epoch
    (bounded by id-bucket pruning): the transaction log replaces that
    scan when record ids are unique per record (append-only event
    streams). Cross-epoch PK dedup, if the source can re-mint ids, still
    needs start_ingest's pruned anti-join.

        stream.writeStream.foreachBatch(manifest_sink(table, dim)).start()
    """

    def body(batch: DataFrame, epoch_id: int) -> None:
        accepted, quarantined = split_valid(batch, dim)
        accepted, quarantined = _constraint_split(table, accepted, quarantined)
        table.commit_append(
            accepted.dropDuplicates(["entry_id"]), epoch_id=epoch_id
        )
        _write_quarantine(quarantined, quarantine_path, epoch_id)

    return body


def bucketed_manifest_sink(
    table,
    dim: int,
    quarantine_path: str | None = None,
    id_col: str = "entry_id",
):
    """foreachBatch body: validated, EXACTLY-ONCE append into a
    BucketedManifestTable (sources/manifest.py) — the streaming story
    reaching the layout the 100 TB merge path needs.

    Two independent duplicate classes, two mechanisms:

    - **epoch replay** (the same epoch_id redelivered after a crash):
      absorbed by `commit_append`'s epoch marker exactly like
      `manifest_sink` — checked up front so a replayed epoch costs one
      log read and zero data work.
    - **re-minted ids across DIFFERENT epochs** (an at-least-once
      producer re-emitting a record with new offsets — the class epoch
      idempotency fundamentally cannot catch): a PK anti-join against
      the current snapshot, reading ONLY the hash buckets the batch
      touches (`read_buckets` — the manifest's per-file bucket map
      prunes the scan as pure metadata). Per-epoch dedup cost is
      ∝ |touched buckets| / n_buckets of the table, bounded by the
      batch's own id spread — the `start_ingest` id-bucket idea,
      carried onto the transaction log so DVs, time travel, and
      bounded MERGE all compose with streaming ingest.

    A soft-deleted id (deletion vector) is NOT treated as existing —
    read_buckets subtracts DV rows — so delete-then-reingest works; an
    id deleted in the same epoch as its redelivery stays deleted only
    if the delete committed after this epoch.

    The table must be bucketed by `id_col` so batch rows and stored
    rows agree on the bucket mapping; a mismatched key raises at sink
    construction, not mid-stream.
    """
    from aeuc_vector_db_spark.sources.manifest import BucketedManifestTable

    if not isinstance(table, BucketedManifestTable):
        raise ValueError(
            "bucketed_manifest_sink requires a BucketedManifestTable; "
            "use manifest_sink for a flat ManifestTable"
        )
    if table.key != id_col:
        raise ValueError(
            f"table is bucketed by {table.key!r} but the sink dedups on "
            f"{id_col!r} — the bucket key must be the PK for pruned dedup"
        )

    def body(batch: DataFrame, epoch_id: int) -> None:
        spark = batch.sparkSession
        # constraint split BEFORE PK dedup (mirrors manifest_sink): with
        # the reversed order, dropDuplicates could keep the
        # constraint-VIOLATING copy of a duplicated id and quarantine
        # it, silently losing the valid copy by partition luck
        accepted, quarantined = split_valid(batch, dim)
        accepted, quarantined = _constraint_split(table, accepted, quarantined)
        accepted = accepted.dropDuplicates([id_col])
        if str(epoch_id) in table.committed_epochs():
            # replayed epoch: the DATA commit is already absorbed, but
            # the quarantine write may have been lost to a crash between
            # commit_append and _write_quarantine — rewrite it (epoch-
            # scoped overwrite, idempotent), same guarantee as
            # manifest_sink: exactly-once regardless of where in the
            # epoch the crash landed
            _write_quarantine(quarantined, quarantine_path, epoch_id)
            return
        if table.latest_version() is not None:
            # small local materialization (micro-batch-sized) so the
            # bucket-set collect and the anti-join don't recompute the
            # validation split
            accepted = accepted.localCheckpoint(eager=True)
            buckets = [
                r["__b__"]
                for r in accepted.select(table._bucket_col().alias("__b__"))
                .distinct()
                .collect()
            ]
            if buckets:
                existing = table.read_buckets(spark, buckets).select(id_col)
                accepted = accepted.join(existing, id_col, "left_anti")
        table.commit_append(accepted, epoch_id=epoch_id)
        _write_quarantine(quarantined, quarantine_path, epoch_id)

    return body


def windowed_hll_distinct(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window: str = "1 hour",
) -> DataFrame:
    """Per-window approximate distinct-key counts via the engine's
    cross-engine HLL (operators/sketch.py): tumbling event-time windows
    → register max → estimate fold. Output: (window_start_us,
    hll_estimate, n_zero_registers, s_scaled).

    Both stages are incremental windowed aggregates, so the SAME plan
    runs under Structured Streaming (chained stateful windowed aggs,
    Spark ≥ 3.4, with a watermark upstream) — per-window state is the
    ≤ 512-register vector, mergeable across micro-batches by max. This
    is the streaming shape COUNT(DISTINCT) fundamentally can't take:
    exact distinct state grows with cardinality, register state is
    fixed-size forever. Batch ≡ streaming (pinned in
    test_streaming.py); the batch form is DuckDB-oracled
    (`events_windowed_hll`)."""
    from aeuc_vector_db_spark.operators.sketch import (
        HLL_ALPHA,
        HLL_M,
        HLL_W,
        hll_register_cols,
    )

    register, rho = hll_register_cols(F.col(key_col).cast("string"))
    regs = (
        events.groupBy(
            F.window(F.col(ts_col), window).alias("w"), register.alias("register")
        )
        .agg(F.max(rho).alias("maxrho"))
    )
    agg = regs.groupBy("w").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_W + 1} - maxrho)")
        ).alias("s_present"),
    )
    v_zero = F.lit(HLL_M) - F.col("n_present")
    s_scaled = F.col("s_present") + v_zero.cast("long") * F.lit(
        1 << (HLL_W + 1)
    ).cast("long")
    e_raw = (
        F.lit(HLL_ALPHA * HLL_M * HLL_M * float(1 << (HLL_W + 1)))
        / s_scaled.cast("double")
    )
    estimate = F.when(
        (e_raw <= F.lit(2.5 * HLL_M)) & (v_zero > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / v_zero.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        F.unix_micros(F.col("w.start")).alias("window_start_us"),
        estimate.alias("hll_estimate"),
        v_zero.cast("long").alias("n_zero_registers"),
        s_scaled.cast("long").alias("s_scaled"),
    )


def dedup_within_watermark(
    entries: DataFrame,
    key_cols: "tuple[str, ...]" = ("entry_id",),
    ts_col: str = "ts",
    delay: str = "10 minutes",
) -> DataFrame:
    """In-flight streaming dedup with BOUNDED state.

    Keeps the first arrival per key; re-deliveries of the same key
    arriving within `delay` of each other are dropped before they reach
    the sink — cutting the per-epoch anti-join work the exactly-once
    sink (`start_ingest`) would otherwise spend on them.

    The watermark is the 100 TB design point: a plain
    ``dropDuplicates(keys)`` on a stream keeps state for every key EVER
    seen and grows without bound; ``dropDuplicatesWithinWatermark``
    evicts a key's state once the watermark passes its event time, so
    state size tracks the (rate × delay) window, not stream history.
    The trade is explicit: a duplicate arriving later than `delay` after
    the original is NOT caught here — that's the sink anti-join's job,
    which is why this operator composes in FRONT of it rather than
    replacing it. Works identically on batch DataFrames (watermark is a
    no-op there), so batch twins can pin the key-set semantics.
    """
    missing = [c for c in (*key_cols, ts_col) if c not in entries.columns]
    if missing:
        raise ValueError(f"dedup_within_watermark: missing columns {missing}")
    out = entries
    if out.isStreaming:
        out = out.withWatermark(ts_col, delay)
        return out.dropDuplicatesWithinWatermark(list(key_cols))
    return out.dropDuplicates(list(key_cols))
