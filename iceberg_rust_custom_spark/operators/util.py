"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input is under-partitioned
    (e.g. one small parquet file → 1 task hogging 1 of 32 cores in a
    compute-heavy operator). At real scale inputs already carry hundreds of
    partitions and this is a no-op — no extra shuffle."""
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
