"""Integration tests: Structured Streaming VectorEntry ingest (real
readStream → foreachBatch, availableNow trigger) and multimodal binary
plumbing (binaryFile source, mapInPandas stubs)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from aeuc_vector_db_spark.sources import multimodal as MM
from aeuc_vector_db_spark.streaming import ingest as SI

DIM = 4


def _entry(i: int, dim: int = DIM, glyph: int | None = None, ctx: int = 0) -> str:
    return json.dumps(
        {
            "entry_id": f"e{i}",
            "glyph_id": glyph if glyph is not None else i,
            "outer_context_id": ctx,
            "embedding": [0.1 * i] * dim,
            "source_tag": "test",
            "version": "0.1.0",
            "ts": "2024-01-01T00:00:%02d.000Z" % (i % 60),
        }
    )


def _run_ingest(
    spark, tmp, lines_by_file: dict[str, list[str]], n_buckets: int = SI.N_ID_BUCKETS
) -> tuple[int, int]:
    src = f"{tmp}/src"
    os.makedirs(src, exist_ok=True)
    for fname, lines in lines_by_file.items():
        with open(f"{src}/{fname}", "w") as f:
            f.write("\n".join(lines))
    q = SI.start_ingest(
        spark, src, f"{tmp}/corpus", f"{tmp}/quarantine", f"{tmp}/ckpt",
        dim=DIM, available_now=True, n_buckets=n_buckets,
    )
    q.awaitTermination(120)
    corpus = spark.read.parquet(f"{tmp}/corpus").count()
    try:
        quarantined = spark.read.parquet(f"{tmp}/quarantine").count()
    except Exception:
        quarantined = 0
    return corpus, quarantined


def test_stream_ingest_validates_and_appends(spark, tmp_path):
    good = [_entry(i) for i in range(5)]
    bad = [
        _entry(100, dim=DIM + 2),          # wrong dim → quarantine
        _entry(101, glyph=144_000),        # glyph range → quarantine
        _entry(102, ctx=10),               # ctx range → quarantine
    ]
    corpus, quarantined = _run_ingest(spark, str(tmp_path), {"a.jsonl": good + bad})
    assert corpus == 5
    assert quarantined == 3
    reasons = {
        r["reject_reason"]
        for r in spark.read.parquet(f"{tmp_path}/quarantine").collect()
    }
    assert reasons == {"embedding_dim_or_nan", "glyph_id_range", "ctx_range"}


def test_stream_ingest_dedups_across_epochs(spark, tmp_path):
    tmp = str(tmp_path)
    c1, _ = _run_ingest(spark, tmp, {"a.jsonl": [_entry(i) for i in range(3)]})
    assert c1 == 3
    # second run: overlapping ids e1,e2 + new e3 → only e3 appended
    c2, _ = _run_ingest(spark, tmp, {"b.jsonl": [_entry(i) for i in range(1, 4)]})
    assert c2 == 4
    ids = {r["entry_id"] for r in spark.read.parquet(f"{tmp}/corpus").collect()}
    assert ids == {"e0", "e1", "e2", "e3"}


def test_stream_ingest_n_buckets_mismatch_raises(spark, tmp_path):
    """A restart with a different n_buckets would prune the WRONG
    id_bucket partitions and silently append duplicate ids — the layout
    marker written at corpus creation must turn that into a loud error
    (ADVICE r3: nothing previously enforced the docstring's 'must stay
    fixed' contract)."""
    tmp = str(tmp_path)
    c1, _ = _run_ingest(spark, tmp, {"a.jsonl": [_entry(i) for i in range(3)]})
    assert c1 == 3
    assert SI.read_layout_marker(f"{tmp}/corpus") == SI.N_ID_BUCKETS
    from pyspark.sql.streaming import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="n_buckets"):
        _run_ingest(
            spark, tmp, {"b.jsonl": [_entry(9)]},
            n_buckets=SI.N_ID_BUCKETS * 2,
        )
    # the corpus is unchanged — the mismatch aborted before any append
    assert spark.read.parquet(f"{tmp}/corpus").count() == 3


def test_layout_marker_backfill_validates_sample(spark, tmp_path):
    """A bucketed corpus WITHOUT a marker (written before markers
    existed): enforce_layout re-derives the bucket for a sample and
    raises on mismatch; on agreement it backfills the marker."""
    tmp = str(tmp_path)
    c1, _ = _run_ingest(spark, tmp, {"a.jsonl": [_entry(i) for i in range(4)]})
    assert c1 == 4
    os.remove(f"{tmp}/corpus/{SI.LAYOUT_MARKER}")
    base = spark.read.parquet(f"{tmp}/corpus")
    # wrong fan-out against real id_bucket values → loud error
    with pytest.raises(ValueError, match="inconsistent"):
        SI.enforce_layout(base, f"{tmp}/corpus", SI.N_ID_BUCKETS + 7, "entry_id")
    # correct fan-out → validates and backfills the marker
    SI.enforce_layout(base, f"{tmp}/corpus", SI.N_ID_BUCKETS, "entry_id")
    assert SI.read_layout_marker(f"{tmp}/corpus") == SI.N_ID_BUCKETS


def test_stream_dedup_scan_is_partition_pruned(spark, tmp_path):
    """The per-epoch dedup anti-join must NOT scan the whole corpus:
    the corpus is laid out partitioned by id bucket and the existing-ids
    read carries PartitionFilters on id_bucket — bounded per-epoch cost
    at 100 TB (PLANS.md)."""
    tmp = str(tmp_path)
    c1, _ = _run_ingest(spark, tmp, {"a.jsonl": [_entry(i) for i in range(8)]})
    assert c1 == 8
    # the corpus landed bucketed
    corpus = spark.read.parquet(f"{tmp}/corpus")
    assert "id_bucket" in corpus.columns
    present = sorted(r["id_bucket"] for r in corpus.select("id_bucket").distinct().collect())
    assert present, "corpus should have id buckets"
    probe = present[:2]
    df = SI.pruned_existing_ids(spark, f"{tmp}/corpus", probe)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan, plan
    scan_part = plan.split("PartitionFilters", 1)[1][:300]
    assert "id_bucket" in scan_part, f"no id_bucket partition filter: {scan_part}"
    # pruned read returns exactly the rows of those buckets
    expected = corpus.filter(F.col("id_bucket").isin(probe)).count()
    assert df.count() == expected > 0


def test_stream_ingest_legacy_flat_corpus_still_dedups(spark, tmp_path):
    """A corpus written before the bucketed layout (no id_bucket column)
    must keep correct PK dedup (full anti-join fallback) and keep its
    flat layout — bucketed subdirectories must not be mixed in."""
    tmp = str(tmp_path)
    # seed a legacy flat corpus by hand
    legacy = spark.createDataFrame(
        [("e0", 0, 0, [0.0] * DIM, "t", None, "1", None)],
        "entry_id string, glyph_id long, outer_context_id int,"
        " embedding array<float>, source_tag string,"
        " meta map<string,string>, version string, ts timestamp",
    )
    legacy.write.parquet(f"{tmp}/corpus")
    # stream e0 (dup) + e1 (new)
    c, _ = _run_ingest(spark, tmp, {"a.jsonl": [_entry(0), _entry(1)]})
    assert c == 2  # e0 NOT duplicated
    corpus = spark.read.parquet(f"{tmp}/corpus")
    assert "id_bucket" not in corpus.columns  # layout stayed flat
    assert {r["entry_id"] for r in corpus.collect()} == {"e0", "e1"}


def test_windowed_agg_streaming_matches_batch(spark, tmp_path):
    """The same hourly_window_counts plan run as a stream (availableNow)
    and as a batch query over identical data must agree — the batch ≡
    streaming property the declared queries rely on."""
    src = f"{tmp_path}/src"
    os.makedirs(src)
    rows = [
        {"entry_id": f"e{i}", "glyph_id": 1, "outer_context_id": 0,
         "embedding": [0.1] * DIM, "source_tag": "t", "version": "1",
         "ts": f"2024-01-01T{i % 3:02d}:10:00.000Z"}
        for i in range(9)
    ]
    with open(f"{src}/x.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))

    stream = SI.read_vector_entry_stream(spark, src).withColumn(
        "event_type", F.lit("ingest")
    ).withColumn("value", F.lit(1.0))
    agg = SI.hourly_window_counts(stream)
    # complete mode: emit ALL windows at end-of-stream (append mode would
    # correctly hold back the last window until the watermark passes it —
    # that per-window finalization is exercised implicitly by the
    # ingest tests; here we compare totals against batch)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory").queryName("win_test")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start_us"], r["n_events"])
        for r in spark.sql("select * from win_test").collect()
    }
    batch_df = spark.read.schema(
        "entry_id string, glyph_id long, outer_context_id int,"
        " embedding array<float>, source_tag string, version string, ts timestamp"
    ).json(src).withColumn("event_type", F.lit("ingest")).withColumn("value", F.lit(1.0))
    batched = {
        (r["window_start_us"], r["n_events"])
        for r in SI.hourly_window_counts(batch_df).collect()
    }
    assert streamed == batched and len(batched) == 3


def test_multimodal_binary_roundtrip(spark, tmp_path):
    blob_dir = f"{tmp_path}/blobs"
    os.makedirs(blob_dir)
    payloads = {"a.png": b"\x89PNG-fake-1", "b.jpg": b"fake-jpeg-2", "c.wav": b"RIFF-fake"}
    for name, data in payloads.items():
        with open(f"{blob_dir}/{name}", "wb") as f:
            f.write(data)
    blobs = MM.read_binary_dir(spark, blob_dir)
    rows = {r["blob_id"]: r for r in blobs.collect()}
    assert rows["a.png"]["modality"] == "image"
    assert rows["c.wav"]["modality"] == "audio"
    assert bytes(rows["b.jpg"]["content"]) == b"fake-jpeg-2"
    assert rows["a.png"]["meta"]["length"] == str(len(payloads["a.png"]))


def test_image_decode_stub_deterministic(spark, tmp_path):
    df = spark.createDataFrame(
        [("x", "image", bytearray(b"payload-1"), None),
         ("y", "image", bytearray(b"payload-2"), None)],
        MM.MULTIMODAL_SCHEMA,
    )
    feats1 = {r["blob_id"]: r for r in MM.decode_image_features_stub(df, 8).collect()}
    feats2 = {r["blob_id"]: r for r in MM.decode_image_features_stub(df, 8).collect()}
    assert feats1["x"]["features"] == feats2["x"]["features"]  # deterministic
    assert feats1["x"]["features"] != feats1["y"]["features"]
    assert len(feats1["x"]["features"]) == 8
    assert 16 <= feats1["x"]["width"] <= 255


def test_image_decode_stub_strict_raises(spark):
    df = spark.createDataFrame([("x", "image", bytearray(b"p"), None)], MM.MULTIMODAL_SCHEMA)
    with pytest.raises(Exception) as exc:
        MM.decode_image_features_stub(df, strict=True).collect()
    assert "NotImplementedError" in str(exc.value) or "image decode stub" in str(exc.value)


def test_frame_sampling_expands_rows(spark):
    df = spark.createDataFrame(
        [("v1", "video", bytearray(b"video-bytes"), None)], MM.MULTIMODAL_SCHEMA
    )
    frames = MM.sample_frames_stub(df, every_ms=500, max_frames=3).collect()
    assert len(frames) == 3
    assert [f["frame_ts_ms"] for f in frames] == [0, 500, 1000]
    assert len({bytes(f["frame_bytes"]) for f in frames}) == 3  # distinct per idx


def test_null_field_rows_are_quarantined_not_dropped(spark):
    """Rows whose validity predicate evaluates to NULL (corrupt lines →
    null fields) must reach the quarantine split, not vanish."""
    df = spark.createDataFrame(
        [("ok", 1, 0, [0.1] * DIM, None, None, None),
         ("corrupt", None, None, [0.1] * DIM, None, None, None)],
        "entry_id string, glyph_id long, outer_context_id int,"
        " embedding array<float>, source_tag string, version string, ts timestamp",
    )
    accepted, quarantined = SI.split_valid(df, DIM)
    assert accepted.count() == 1
    rows = quarantined.collect()
    assert len(rows) == 1 and rows[0]["entry_id"] == "corrupt"


def test_rate_source_exactly_once_through_manifest_sink(spark, tmp_path):
    """Non-file streaming source end-to-end: a rate-micro-batch stream
    (the Kafka-shaped case — offsets, not files; batches keep coming)
    mapped into VectorEntry rows and committed through manifest_sink.
    Stop mid-stream and restart from the checkpoint: whatever the last
    epoch's delivery state was, the table must hold each generated row
    EXACTLY once (offset replay absorbed by epoch idempotence), with
    row count = 5 x committed epochs."""
    import time as _time

    from pyspark.sql import functions as F

    from aeuc_vector_db_spark.sources.manifest import ManifestTable

    dim = 4
    t = ManifestTable(str(tmp_path / "table"))
    ckpt = str(tmp_path / "ckpt")

    def entries(stream_df):
        return stream_df.select(
            F.concat(F.lit("r"), F.col("value").cast("string")).alias("entry_id"),
            (F.col("value") % 144000).alias("glyph_id"),
            (F.col("value") % 10).cast("int").alias("outer_context_id"),
            F.array(*[(F.col("value") % 7 + i).cast("float") / 7.0 for i in range(dim)])
            .alias("embedding"),
            F.lit("rate").alias("source_tag"),
            F.create_map().cast("map<string,string>").alias("meta"),
            F.lit("0.1.0").alias("version"),
            F.col("timestamp").alias("ts"),
        )

    def start():
        src = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 5)
            .option("numPartitions", 2)
            .load()
        )
        return (
            entries(src)
            .writeStream.foreachBatch(SI.manifest_sink(t, dim))
            .option("checkpointLocation", ckpt)
            .start()
        )

    def wait_for_epochs(n, timeout_s=60):
        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            if len(t.committed_epochs()) >= n:
                return
            _time.sleep(0.3)
        raise AssertionError(f"fewer than {n} epochs committed in {timeout_s}s")

    q = start()
    try:
        wait_for_epochs(3)
    finally:
        q.stop()
    # restart from the checkpoint: the stream resumes at its offsets; a
    # replayed last epoch must be absorbed, new epochs keep arriving
    n_before = len(t.committed_epochs())
    q = start()
    try:
        wait_for_epochs(n_before + 2)
    finally:
        q.stop()
    final = t.read(spark)
    n_rows = final.count()
    assert n_rows == 5 * len(t.committed_epochs())  # 5 rows per epoch, no dups
    assert final.select("entry_id").distinct().count() == n_rows
    # the generated ids are the contiguous counter range — nothing lost
    vals = sorted(int(r["entry_id"][1:]) for r in final.select("entry_id").collect())
    assert vals == list(range(len(vals)))


def test_offset_source_exactly_once_through_offsets(spark, tmp_path):
    """Kafka-shaped source end-to-end exactly-once THROUGH OFFSETS (not
    just epoch ids): the sink manifest carries each batch's end-offset
    range, the consumer resumes from the sink's own log, and an
    explicit redelivery of an already-committed range is absorbed
    because same offsets ⇒ same epoch marker ⇒ idempotent commit."""
    from aeuc_vector_db_spark.sources.manifest import ManifestTable
    from aeuc_vector_db_spark.streaming import offset_source as OS

    src = OS.OffsetLogSource(str(tmp_path / "log"), n_partitions=2)
    t = ManifestTable(str(tmp_path / "table"))

    def rec(i: int, dim: int = DIM) -> dict:
        return json.loads(_entry(i, dim=dim))

    src.append(0, [rec(i) for i in range(0, 6)])
    src.append(1, [rec(i) for i in range(6, 10)])
    # small per-partition batches force multiple offset-carrying commits
    n = OS.run_offset_ingest(spark, src, t, DIM, max_records_per_partition=3)
    assert n >= 2
    got = sorted(r["entry_id"] for r in t.read(spark).collect())
    assert got == sorted(f"e{i}" for i in range(10))

    # crash-after-commit: a fresh consumer resumes at the sink's
    # committed offsets and finds nothing to do — zero new commits
    assert OS.committed_source_offsets(t) == src.latest_offsets()
    assert OS.run_offset_ingest(spark, src, t, DIM) == 0
    assert t.read(spark).count() == 10

    # crash-BEFORE-commit: redeliver a range that was already committed
    # (re-poll from an earlier start to the same end). Same end offsets
    # ⇒ same epoch marker ⇒ commit_append returns None, no duplicates.
    batch, end = src.poll(spark, {0: 3, 1: 0})
    assert batch is not None and end == src.latest_offsets()
    from aeuc_vector_db_spark import schemas
    parsed = batch.select(
        F.from_json(F.col("value"), schemas.VECTOR_ENTRY_SCHEMA).alias("r")
    ).select("r.*")
    v_before = t.latest_version()
    assert t.commit_append(parsed, epoch_id=OS._canonical_offsets(end)) is None
    assert t.latest_version() == v_before
    assert t.read(spark).count() == 10

    # new records after the dup storm ingest exactly once, resuming
    # from the sink; an invalid row (wrong dim) is dropped by
    # validation, never committed
    src.append(0, [rec(10), rec(11, dim=DIM + 2)])
    assert OS.run_offset_ingest(spark, src, t, DIM) == 1
    got = sorted(r["entry_id"] for r in t.read(spark).collect())
    assert got == sorted(f"e{i}" for i in range(11))

    # resume point survives vacuum: markers fold into the retired-epoch
    # set, so even a truncated log re-derives the max committed offsets
    t.commit_overwrite(t.read(spark))  # newest manifest has no epoch
    t.vacuum(retain_last=1, min_age_s=0.0)
    assert OS.committed_source_offsets(t) == src.latest_offsets()
    assert OS.run_offset_ingest(spark, src, t, DIM) == 0


def test_stream_stream_join_attribution_and_late_drop(spark, tmp_path):
    """Stream-stream inner join with watermarks + event-time bounds:
    on-time clicks attribute to their impression; a click arriving in a
    later micro-batch with an event time behind the watermark is dropped
    (and the matching impression's state was evicted) — the bounded-state
    contract. Batch mode on identical data keeps the late pair, which
    pins that the difference is watermark semantics, not the join."""
    imp_dir, clk_dir = f"{tmp_path}/imp", f"{tmp_path}/clk"
    os.makedirs(imp_dir); os.makedirs(clk_dir)
    schema = "user_id string, ad_id string, ts timestamp"

    def write(path, rows, mtime):
        with open(path, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))
        os.utime(path, (mtime, mtime))

    write(f"{imp_dir}/i.jsonl", [
        {"user_id": "u1", "ad_id": "adA", "ts": "2024-01-01T10:00:00.000Z"},
        {"user_id": "u2", "ad_id": "adB", "ts": "2024-01-01T10:05:00.000Z"},
        {"user_id": "u3", "ad_id": "adC", "ts": "2024-01-01T08:00:00.000Z"},
    ], 1_000)
    # batch 1: on-time click (joins) + out-of-window click (never joins,
    # but its 13:00 event time races the watermark forward)
    write(f"{clk_dir}/c1.jsonl", [
        {"user_id": "u1", "ad_id": "adA", "ts": "2024-01-01T10:10:00.000Z"},
        {"user_id": "u2", "ad_id": "adB", "ts": "2024-01-01T13:00:00.000Z"},
    ], 1_000)
    # batch 2: matchless on-time click; at its end the join evicts state
    # using the post-batch-1 watermark (≈09:35): u3's 08:00 impression is
    # past imp_ts + max_delay and goes. (A late row itself is only
    # best-effort dropped — eviction is the hard guarantee, so the test
    # gives eviction a batch boundary to run on.)
    write(f"{clk_dir}/c2.jsonl", [
        {"user_id": "u9", "ad_id": "adZ", "ts": "2024-01-01T10:20:00.000Z"},
    ], 2_000)
    # batch 3: in-window pair for u3, but its impression's state is gone
    # and 08:10 is far behind the watermark → no output
    write(f"{clk_dir}/c3.jsonl", [
        {"user_id": "u3", "ad_id": "adC", "ts": "2024-01-01T08:10:00.000Z"},
    ], 3_000)

    imp_s = spark.readStream.schema(schema).json(imp_dir)
    clk_s = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # forces c1 then c2 as separate batches
        .json(clk_dir)
    )
    q = (
        SI.attribute_clicks(imp_s, clk_s)
        .writeStream.outputMode("append")
        .format("memory").queryName("attrib_test")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["user_id"], r["ad_id"], r["delay_us"])
        for r in spark.sql("select * from attrib_test").collect()
    }
    assert streamed == {("u1", "adA", 600_000_000)}
    # the bounded-state contract left a trace: the join operator removed
    # state rows as the watermark advanced
    removed = sum(
        op["numRowsRemoved"]
        for p in q.recentProgress
        for op in p["stateOperators"]
    )
    assert removed > 0

    imp_b = spark.read.schema(schema).json(imp_dir)
    clk_b = spark.read.schema(schema).json(clk_dir)
    batched = {
        (r["user_id"], r["ad_id"], r["delay_us"])
        for r in SI.attribute_clicks(imp_b, clk_b).collect()
    }
    assert batched == {
        ("u1", "adA", 600_000_000),
        ("u3", "adC", 600_000_000),  # batch keeps it: proves the drop above
    }                                 # was the watermark, not the join


def test_committed_offsets_known_hint_bounds_walk(spark, tmp_path):
    """committed_source_offsets(known=...) must stop the backward walk
    at the cached version and fall back to the cached offsets when no
    newer marker exists — so a driving loop costs O(new versions), not
    O(full history), per batch (round-6 ADVICE #5)."""
    from aeuc_vector_db_spark.sources.manifest import ManifestTable
    from aeuc_vector_db_spark.streaming import offset_source as OS

    src = OS.OffsetLogSource(str(tmp_path / "log"), n_partitions=1)
    t = ManifestTable(str(tmp_path / "table"))
    src.append(0, [json.loads(_entry(i)) for i in range(4)])
    assert OS.run_offset_ingest(spark, src, t, DIM) == 1
    marker_v = t.latest_version()
    committed = OS.committed_source_offsets(t)
    assert committed == src.latest_offsets()

    # bury the marker under a long NON-offset history
    for _ in range(5):
        t.commit_overwrite(t.read(spark))
    # full walk still finds it
    assert OS.committed_source_offsets(t) == committed
    # cached hint: walk stops at marker_v and returns the cached value
    # even though versions ≤ marker_v are never read — prove that by
    # handing a hint whose offsets DIFFER from the log's true marker
    fake = {0: 999}
    assert OS.committed_source_offsets(t, known=(t.latest_version(), fake)) == fake
    # a marker NEWER than the hint wins over the cache
    src.append(0, [json.loads(_entry(i)) for i in range(4, 6)])
    assert OS.run_offset_ingest(spark, src, t, DIM) == 1
    newer = OS.committed_source_offsets(t, known=(marker_v, committed))
    assert newer == src.latest_offsets() != committed


def test_windowed_hll_streaming_matches_batch(spark, tmp_path):
    """The windowed HLL runs as TWO chained stateful aggregations
    (register max → estimate fold) — supported in append mode with a
    watermark (Spark ≥ 3.4). A far-future sentinel event pushes the
    watermark past every real window so append emits them all; the
    streamed per-window estimates must equal the batch run of the SAME
    plan bit-for-bit (register state is deterministic, merge = max)."""
    src = f"{tmp_path}/hll_src"
    os.makedirs(src)
    rows = [
        {"user_id": (i * 13) % 37, "ts": f"2024-01-01T{i % 3:02d}:{i % 50:02d}:00.000Z"}
        for i in range(120)
    ] + [{"user_id": 0, "ts": "2024-01-03T00:00:00.000Z"}]  # watermark pusher
    with open(f"{src}/x.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    schema = "user_id long, ts timestamp"

    stream = (
        spark.readStream.schema(schema).json(src).withWatermark("ts", "0 seconds")
    )
    agg = SI.windowed_hll_distinct(stream)
    q = (
        agg.writeStream.outputMode("append")
        .format("memory").queryName("hll_win")
        .option("checkpointLocation", f"{tmp_path}/hll_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        (r["window_start_us"], r["hll_estimate"], r["s_scaled"])
        for r in spark.sql("select * from hll_win").collect()
    }
    batch = spark.read.schema(schema).json(src)
    batched = {
        (r["window_start_us"], r["hll_estimate"], r["s_scaled"])
        for r in SI.windowed_hll_distinct(batch).collect()
    }
    # append held back only the sentinel's own (final) window
    sentinel_us = max(w for w, _, _ in batched)
    assert streamed == {t for t in batched if t[0] != sentinel_us}
    assert len(streamed) == 3


def test_manifest_sink_quarantines_constraint_violations(spark, tmp_path):
    """A CHECK constraint declared on the sink table must act as a
    per-row data-quality verdict in the stream — violators land in the
    quarantine with an auditable reason, clean rows commit, and the
    epoch never crashes on one bad record."""
    from aeuc_vector_db_spark import schemas
    from aeuc_vector_db_spark.sources.manifest import ManifestTable

    dim = DIM
    t = ManifestTable(str(tmp_path / "ctable"))
    seed = f"{tmp_path}/seed.jsonl"
    with open(seed, "w") as f:
        f.write(_entry(0, ctx=0))
    seed_df = spark.read.schema(schemas.VECTOR_ENTRY_SCHEMA).json(seed)
    t.commit_append(seed_df)
    t.add_check_constraint(spark, "ctx_small", "outer_context_id < 5")

    src = f"{tmp_path}/cstream"
    os.makedirs(src)
    with open(f"{src}/x.jsonl", "w") as f:
        f.write("\n".join(_entry(i, ctx=i) for i in range(1, 9)))  # ctx 1..8
    qdir = str(tmp_path / "cquarantine")
    stream = SI.read_vector_entry_stream(spark, src)
    q = (
        stream.writeStream.foreachBatch(SI.manifest_sink(t, dim, qdir))
        .option("checkpointLocation", f"{tmp_path}/cckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    committed = {r["entry_id"] for r in t.read(spark).collect()}
    # seed + ctx 1..4 committed; ctx 5..8 quarantined
    assert committed == {f"e{i}" for i in range(0, 5)}
    quar = spark.read.parquet(qdir)
    rows = {r["entry_id"]: r["reject_reason"] for r in quar.collect()}
    assert set(rows) == {f"e{i}" for i in range(5, 9)}
    assert all(v == "check_constraint:ctx_small" for v in rows.values())


def test_dedup_within_watermark_stream(spark, tmp_path):
    """Re-delivered keys within the watermark window are dropped
    in-flight: exactly one row per key reaches the sink, the key set
    matches the batch twin, and every survivor is a genuine input row.
    (Which duplicate survives is per-batch arrival order — asserted
    membership, not identity.)"""
    src = f"{tmp_path}/dd_src"
    os.makedirs(src)
    rows = []
    for i in range(40):
        rows.append({"event_id": i, "ts": f"2024-01-01T00:{i % 50:02d}:00.000Z",
                     "value": float(i)})
        if i % 3 == 0:  # re-deliver a third of the keys 1 min later
            rows.append({"event_id": i, "ts": f"2024-01-01T00:{(i % 50) + 1:02d}:00.000Z",
                         "value": float(i)})
    with open(f"{src}/x.jsonl", "w") as f:
        f.write("\n".join(json.dumps(r) for r in rows))
    schema = "event_id long, ts timestamp, value double"

    stream = spark.readStream.schema(schema).json(src)
    q = (
        SI.dedup_within_watermark(stream, key_cols=("event_id",), delay="10 minutes")
        .writeStream.outputMode("append")
        .format("memory").queryName("dd_sink")
        .option("checkpointLocation", f"{tmp_path}/dd_ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from dd_sink").collect()
    assert len(got) == 40  # one per key, duplicates dropped in-flight
    assert sorted(r["event_id"] for r in got) == list(range(40))
    inputs = {(r["event_id"], r["value"]) for r in rows}
    assert all((r["event_id"], r["value"]) in inputs for r in got)

    batch = spark.read.schema(schema).json(src)
    batch_keys = sorted(
        r["event_id"]
        for r in SI.dedup_within_watermark(batch, key_cols=("event_id",)).collect()
    )
    assert batch_keys == sorted(r["event_id"] for r in got)

    with pytest.raises(ValueError, match="missing columns"):
        SI.dedup_within_watermark(batch, key_cols=("nope",))


# ---------------------------------------------------------------------------
# Bucketed-manifest streaming sink (round 8): exactly-once into the layout
# the 100 TB merge path needs, with bucket-pruned cross-epoch PK dedup
# ---------------------------------------------------------------------------

def _parsed_batch(spark, ids):
    from aeuc_vector_db_spark import schemas

    lines = [(_entry(i),) for i in ids]
    raw = spark.createDataFrame(lines, "value string")
    return raw.select(
        F.from_json(F.col("value"), schemas.VECTOR_ENTRY_SCHEMA).alias("r")
    ).select("r.*")


def test_bucketed_sink_replay_dedup_and_layout(spark, tmp_path):
    """Crash/replay against the BUCKETED manifest sink: epoch replay is
    absorbed by the epoch marker; a re-minted id in a LATER epoch is
    absorbed by the bucket-pruned PK anti-join; the data layout stays
    __bucket__-partitioned so DVs and bounded MERGE keep composing."""
    from aeuc_vector_db_spark.sources.manifest import BucketedManifestTable

    t = BucketedManifestTable(
        str(tmp_path / "bt"), key="entry_id", n_buckets=8
    )
    body = SI.bucketed_manifest_sink(t, DIM)

    body(_parsed_batch(spark, range(10)), 0)
    v0 = t.latest_version()
    assert t.read(spark).count() == 10

    # crash-before-commit replay: same epoch id redelivered
    body(_parsed_batch(spark, range(10)), 0)
    assert t.latest_version() == v0 and t.read(spark).count() == 10

    # at-least-once producer re-mints ids 5..9 under NEW offsets (a new
    # epoch) — epoch idempotency can't catch these; the pruned anti-join
    # must
    body(_parsed_batch(spark, range(5, 15)), 1)
    got = sorted(r["entry_id"] for r in t.read(spark).collect())
    assert got == sorted(f"e{i}" for i in range(15))

    # layout parity: every data file lives under a __bucket__= dir and
    # the manifest's bucket map covers all files
    m = t.manifest()
    assert m["files"] and all("__bucket__=" in f for f in m["files"])
    assert set(m["buckets"]) == set(m["files"])

    # DV compatibility: soft-delete one id, then re-ingest it in a later
    # epoch — read_buckets subtracts DV rows, so the re-insert lands
    t.delete_where_dv(spark, [("entry_id", "=", "e3")])
    assert t.read(spark).count() == 14
    body(_parsed_batch(spark, [3]), 2)
    got = sorted(r["entry_id"] for r in t.read(spark).collect())
    assert got == sorted(f"e{i}" for i in range(15))


def test_bucketed_sink_replay_rewrites_lost_quarantine(spark, tmp_path):
    """Two exactly-once edges of the bucketed sink:

    1. A duplicated id whose copies DIFFER in constraint validity must
       deterministically commit the VALID copy — the constraint split
       runs before PK dedup, so dropDuplicates can never keep (and then
       quarantine) the violating copy by partition luck.
    2. A crash between commit_append and the quarantine write: replaying
       the epoch must rewrite the lost quarantine rows (epoch-scoped
       overwrite, idempotent) WITHOUT recommitting the data.
    """
    import shutil

    from aeuc_vector_db_spark import schemas
    from aeuc_vector_db_spark.sources.manifest import BucketedManifestTable

    t = BucketedManifestTable(str(tmp_path / "btq"), key="entry_id", n_buckets=4)
    qdir = str(tmp_path / "btq_quar")
    body = SI.bucketed_manifest_sink(t, DIM, qdir)

    body(_parsed_batch(spark, [0]), 0)
    t.add_check_constraint(spark, "ctx_small", "outer_context_id < 5")

    # e1 valid; e2 violates; e3 delivered TWICE — one violating copy,
    # one valid copy (the order-sensitivity trap)
    lines = [
        _entry(1, ctx=1),
        _entry(2, ctx=7),
        _entry(3, ctx=9),
        _entry(3, ctx=2),
    ]
    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    batch = raw.select(
        F.from_json(F.col("value"), schemas.VECTOR_ENTRY_SCHEMA).alias("r")
    ).select("r.*")

    body(batch, 1)
    v1 = t.latest_version()
    committed = {
        r["entry_id"]: r["outer_context_id"] for r in t.read(spark).collect()
    }
    assert committed == {"e0": 0, "e1": 1, "e3": 2}  # the VALID e3 copy
    quar = {
        (r["entry_id"], r["outer_context_id"])
        for r in spark.read.parquet(qdir).collect()
    }
    assert quar == {("e2", 7), ("e3", 9)}

    # crash lost the quarantine write; the epoch marker survived
    shutil.rmtree(qdir)
    body(batch, 1)  # replayed epoch
    assert t.latest_version() == v1  # no data recommit
    assert t.read(spark).count() == 3
    requar = {
        (r["entry_id"], r["outer_context_id"])
        for r in spark.read.parquet(qdir).collect()
    }
    assert requar == quar  # quarantine restored, not duplicated

    # replay with the quarantine intact stays idempotent (overwrite)
    body(batch, 1)
    assert spark.read.parquet(qdir).count() == 2


def test_bucketed_sink_dedup_read_is_bucket_pruned(spark, tmp_path):
    """The dedup read opens ONLY files of the touched buckets: pruning is
    decided from the manifest's per-file bucket map (pure metadata), and
    DataFrame.inputFiles() proves which parquet files the scan planned."""
    from aeuc_vector_db_spark.sources.manifest import BucketedManifestTable

    t = BucketedManifestTable(
        str(tmp_path / "bt2"), key="entry_id", n_buckets=8
    )
    body = SI.bucketed_manifest_sink(t, DIM)
    body(_parsed_batch(spark, range(64)), 0)
    m = t.manifest()
    by_bucket = {}
    for f, b in m["buckets"].items():
        by_bucket.setdefault(int(b), []).append(f)
    assert len(by_bucket) > 2  # 64 ids spread over several buckets
    some = sorted(by_bucket)[:2]
    pruned = t.read_buckets(spark, some)
    opened = {os.path.relpath(p.replace("file:", ""), t.root)
              for p in pruned.inputFiles()}
    expected = {f for b in some for f in by_bucket[b]}
    assert opened == expected
    # parity with the unpruned read + bucket filter
    import pyspark.sql.functions as _F
    full = t.read(spark).filter(
        _F.pmod(_F.xxhash64(_F.col("entry_id").cast("string")), _F.lit(8))
        .cast("int").isin([int(b) for b in some])
    )
    assert sorted(r["entry_id"] for r in pruned.collect()) == sorted(
        r["entry_id"] for r in full.collect()
    )
    with pytest.raises(ValueError, match="outside"):
        t.read_buckets(spark, [99])


def test_bucketed_sink_validation_errors(spark, tmp_path):
    from aeuc_vector_db_spark.sources.manifest import (
        BucketedManifestTable,
        ManifestTable,
    )

    flat = ManifestTable(str(tmp_path / "flat"))
    with pytest.raises(ValueError, match="requires a BucketedManifestTable"):
        SI.bucketed_manifest_sink(flat, DIM)
    t = BucketedManifestTable(str(tmp_path / "bt3"), key="glyph_id", n_buckets=4)
    with pytest.raises(ValueError, match="bucketed by 'glyph_id'"):
        SI.bucketed_manifest_sink(t, DIM)


def test_offset_source_exactly_once_into_bucketed_table(spark, tmp_path):
    """The Kafka-shaped offset source drains into a BUCKETED manifest
    table: offsets→epoch markers give exactly-once on replay, and the
    bucket-pruned PK dedup additionally absorbs a record re-minted
    under fresh offsets (which pure offset idempotency cannot)."""
    from aeuc_vector_db_spark.sources.manifest import BucketedManifestTable
    from aeuc_vector_db_spark.streaming import offset_source as OS

    src = OS.OffsetLogSource(str(tmp_path / "log"), n_partitions=2)
    t = BucketedManifestTable(str(tmp_path / "bt4"), key="entry_id", n_buckets=8)

    def rec(i):
        return json.loads(_entry(i))

    src.append(0, [rec(i) for i in range(0, 6)])
    src.append(1, [rec(i) for i in range(6, 10)])
    assert OS.run_offset_ingest(spark, src, t, DIM,
                                max_records_per_partition=3) >= 2
    got = sorted(r["entry_id"] for r in t.read(spark).collect())
    assert got == sorted(f"e{i}" for i in range(10))

    # crash-after-commit: resume finds nothing to do
    assert OS.run_offset_ingest(spark, src, t, DIM) == 0

    # at-least-once producer appends records 8,9 AGAIN under new offsets
    # plus genuinely-new 10,11: only the new ids land
    src.append(0, [rec(8), rec(10)])
    src.append(1, [rec(9), rec(11)])
    OS.run_offset_ingest(spark, src, t, DIM)
    got = sorted(r["entry_id"] for r in t.read(spark).collect())
    assert got == sorted(f"e{i}" for i in range(12))
    # layout held through every epoch
    m = t.manifest()
    assert all("__bucket__=" in f for f in m["files"])


def test_rate_stream_restart_into_bucketed_sink(spark, tmp_path):
    """Real readStream → checkpoint → stop → restart against the
    bucketed sink: row-set parity (each generated row exactly once) and
    bucket-dir layout after arbitrary epoch replay."""
    import time as _time

    from aeuc_vector_db_spark.sources.manifest import BucketedManifestTable

    dim = 4
    t = BucketedManifestTable(str(tmp_path / "bt5"), key="entry_id", n_buckets=8)
    ckpt = str(tmp_path / "ckpt5")

    def entries(stream_df):
        return stream_df.select(
            F.concat(F.lit("r"), F.col("value").cast("string")).alias("entry_id"),
            (F.col("value") % 144000).alias("glyph_id"),
            (F.col("value") % 10).cast("int").alias("outer_context_id"),
            F.array(*[(F.col("value") % 7 + i).cast("float") / 7.0
                      for i in range(dim)]).alias("embedding"),
            F.lit("rate").alias("source_tag"),
            F.create_map().cast("map<string,string>").alias("meta"),
            F.lit("0.1.0").alias("version"),
            F.col("timestamp").alias("ts"),
        )

    def start():
        src = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", 5)
            .option("numPartitions", 2)
            .load()
        )
        return (
            entries(src)
            .writeStream.foreachBatch(SI.bucketed_manifest_sink(t, dim))
            .option("checkpointLocation", ckpt)
            .start()
        )

    def wait_for_epochs(n, timeout_s=60):
        deadline = _time.time() + timeout_s
        while _time.time() < deadline:
            if len(t.committed_epochs()) >= n:
                return
            _time.sleep(0.3)
        raise AssertionError(f"fewer than {n} epochs committed in {timeout_s}s")

    q = start()
    try:
        wait_for_epochs(3)
    finally:
        q.stop()
    n_before = len(t.committed_epochs())
    q = start()
    try:
        wait_for_epochs(n_before + 2)
    finally:
        q.stop()
    final = t.read(spark)
    n_rows = final.count()
    assert n_rows == 5 * len(t.committed_epochs())
    assert final.select("entry_id").distinct().count() == n_rows
    vals = sorted(int(r["entry_id"][1:]) for r in final.select("entry_id").collect())
    assert vals == list(range(len(vals)))
    m = t.manifest()
    assert m["files"] and all("__bucket__=" in f for f in m["files"])


def test_epoch_commits_race_batch_dv_and_merge(spark, tmp_path):
    """Round 9 (VERDICT r8 #6): the optimistic-concurrency interplay
    between streaming epoch commits and batch DV/merge commits on the
    SAME bucketed table — previously only batch×batch and sink-only
    were covered. Three interleavings:

    1. a sink epoch slips between a DV delete's scan and its publish →
       the delete fails with CommitConflictError (stale vector) and the
       documented re-run succeeds;
    2. a sink epoch slips inside merge_upsert's commit → the merge's
       internal retry recomputes against the new parent and wins;
    3. a DV delete slips between the sink's dedup read and its
       commit_append → the append retries blindly (append semantics)
       and lands on top of the DV commit.

    After every resolution: rows exactly-once (no duplicates), deleted
    ids stay deleted, count_rows stays metadata-exact, and every epoch
    marker survives.
    """
    from aeuc_vector_db_spark.sources.manifest import (
        BucketedManifestTable,
        CommitConflictError,
    )

    root = str(tmp_path / "race")
    t_sink = BucketedManifestTable(root, key="entry_id", n_buckets=4)
    t_batch = BucketedManifestTable(root)  # second handle, same log
    body = SI.bucketed_manifest_sink(t_sink, DIM)

    body(_parsed_batch(spark, range(20)), 0)
    assert t_sink.read(spark).count() == 20

    # -- 1: epoch commit beats the DV delete's publish ------------------
    orig_publish = t_batch._try_publish
    state = {"fired": False}

    def racing_publish(manifest, version):
        if not state["fired"]:
            state["fired"] = True
            body(_parsed_batch(spark, range(20, 25)), 1)  # sink wins
        return orig_publish(manifest, version)

    t_batch._try_publish = racing_publish
    with pytest.raises(CommitConflictError, match="delete_where_dv"):
        t_batch.delete_where_dv(spark, [("entry_id", "=", "e3")])
    t_batch._try_publish = orig_publish
    # the documented contract: re-run the delete against the new snapshot
    t_batch.delete_where_dv(spark, [("entry_id", "=", "e3")])
    got = sorted(r["entry_id"] for r in t_batch.read(spark).collect())
    assert got == sorted(f"e{i}" for i in range(25) if i != 3)
    assert t_batch.count_rows() == 24 == len(got)

    # -- 2: epoch commit inside merge_upsert → internal retry wins ------
    ups = _parsed_batch(spark, [4]).withColumn("source_tag", F.lit("merged"))
    orig_commit = t_batch._commit
    state2 = {"fired": False}

    def racing_commit(*a, **k):
        if not state2["fired"]:
            state2["fired"] = True
            body(_parsed_batch(spark, range(25, 30)), 2)  # sink wins round 1
        return orig_commit(*a, **k)

    t_batch._commit = racing_commit
    t_batch.merge_upsert(spark, ups)
    t_batch._commit = orig_commit
    rows = {r["entry_id"]: r["source_tag"] for r in t_batch.read(spark).collect()}
    assert len(rows) == 29  # 30 ids minus deleted e3; merge rewrote, not dup'd
    assert rows["e4"] == "merged"
    assert "e3" not in rows
    assert t_batch.count_rows() == 29

    # -- 3: DV delete between the sink's dedup read and its append ------
    orig_append = t_sink.commit_append
    state3 = {"fired": False}

    def racing_append(df, **kw):
        if not state3["fired"]:
            state3["fired"] = True
            # e10 is carried by the incoming epoch (already dedup'd out
            # against the pre-delete snapshot); e5 is not in the epoch
            t_batch.delete_where_dv(spark, [("entry_id", "=", "e10")])
            t_batch.delete_where_dv(spark, [("entry_id", "=", "e5")])
        return orig_append(df, **kw)

    t_sink.commit_append = racing_append
    body(_parsed_batch(spark, list(range(10, 13)) + list(range(30, 33))), 3)
    t_sink.commit_append = orig_append
    got = sorted(r["entry_id"] for r in t_batch.read(spark).collect())
    # e10/e5 deleted and NOT resurrected (the epoch's e10 copy was
    # dedup'd against the pre-delete snapshot — delete-wins, consistent
    # with "deleted stays deleted unless a LATER epoch re-ingests");
    # e30..e32 landed exactly once
    expect = sorted(
        f"e{i}" for i in range(33) if i not in (3, 5, 10) and (i < 30 or i >= 30)
    )
    assert got == expect
    assert len(got) == len(set(got))  # no duplicates anywhere
    assert t_batch.count_rows() == len(got)
    # every epoch marker survived the races (exactly-once replay intact)
    assert {"0", "1", "2", "3"} <= set(t_sink.committed_epochs())
    # a LATER epoch can re-ingest the deleted id (DV-subtracted dedup)
    body(_parsed_batch(spark, [10]), 4)
    got2 = sorted(r["entry_id"] for r in t_batch.read(spark).collect())
    assert "e10" in got2 and len(got2) == len(got) + 1
