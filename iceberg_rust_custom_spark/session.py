"""SparkSession factory tuned for the local[N] test harness.

All knobs here are also the right defaults for a real cluster except
``master`` and memory sizing: AQE on (runtime re-plan, skew-join splitting,
partition coalescing), UTC session timezone (oracle comparability), Arrow
for pandas interchange, shuffle partitions sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "iceberg_rust_custom_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # split splittable file scans to at least cluster parallelism — a
        # single small parquet file otherwise becomes 1 task hogging 1 core
        # in compute-heavy operators (lets ensure_min_parallelism skip its
        # probe entirely for file-backed plans)
        .config("spark.sql.files.minPartitionNum", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # local-mode note: driver heap IS the executor heap; default high so
        # shuffles/aggregations at bench scale never touch GC walls (the
        # harness box has 128 GiB; override with SPARK_GRAFT_DRIVER_MEM)
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.ui.enabled", "false")
        # r13: operators materialize shared subtrees with per-invocation
        # localCheckpoint; their blocks are released by the ContextCleaner
        # only after a driver GC notices the RDD is unreachable. The
        # default periodic-GC interval (30min) lets dead checkpoint blocks
        # accumulate across a many-query session and evict live ones —
        # tighten it so storage turns over with the workload.
        .config("spark.cleaner.periodicGC.interval", "45s")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Spark 4 gates its native GEOMETRY/GEOGRAPHY types behind this
        # flag; the engine maps Iceberg v3 geo columns onto them (WKB
        # binary physical storage, metadata/schema.py). Runtime-settable,
        # so pre-existing sessions are handled at first geo decode too.
        .config("spark.sql.geospatial.enabled", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
