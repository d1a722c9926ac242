"""SparkSession factory tuned for this engine.

Local mode is the test substrate; the config choices (AQE on, shuffle
partitions sized to cores, Arrow on, UTC timezone) are the same ones that
matter on a real cluster — only the numbers change.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "aeuc-vector-db-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    Defaults follow the local[32] test substrate; on a real cluster the
    caller overrides master/memory via spark-submit and only the SQL conf
    below carries over.
    """
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # Broadcast threshold: dim tables / query batches / centroid sets
        # are all tiny relative to the corpus — make sure they broadcast.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Scan split size (optimization round 16, guide §6): the input
        # split is the scan-parallelism lever. The fixture tables are
        # ONE parquet file each (lineitem 10.8 MB at sf0.1), so the
        # 128 MB default scans them as one task and every scan-bound
        # aggregate serializes on 1 of the cores; 8 MB splits the big
        # fixtures across cores (measured interleaved at sf0.1: Q1-shape
        # pricing_summary 1.39→1.25, late_order_priority 1.27→1.03,
        # rfm_segments 1.61→0.99, binary_hamming 1.58→1.29, ivf_pruned
        # 1.23→1.00; finer than 8 MB adds nothing). Scale-dependent and
        # therefore env-parameterised: on a real cluster scanning TB
        # inputs, RAISE it (512 MB–1 GB per guide §9 — fewer, larger map
        # tasks feeding each shuffle); the local default only matters
        # for single-file fixture scans.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "8m"),
        )
        # Fixture parquet stores TIMESTAMP(NANOS); Spark has no nanos type.
        # Read them as epoch-nanos longs; sources.tables converts to
        # TimestampType (values are µs-granular, so the cast is lossless).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Bucketed+sorted table scans (the MinHash band table, the
        # bucketed-join evidence tables) report their sortBy order only
        # under this flag (off by default since Spark 3.0 because the
        # one-file-per-bucket check needs a file listing — which these
        # tables' writers guarantee via repartition(n_buckets, key)
        # before bucketBy). With it on, an SMJ against a compacted
        # band table elides the corpus-side Sort; multi-file buckets
        # (post-append) simply fall back to sorting, never mis-plan.
        .config("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
