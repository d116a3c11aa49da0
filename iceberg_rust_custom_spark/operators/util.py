"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ONLY when the input is under-partitioned
    (e.g. one small parquet file → 1 task hogging 1 of 32 cores in a
    compute-heavy operator). At real scale inputs already carry hundreds of
    partitions and this is a no-op — no extra shuffle.

    The probe avoids ``df.rdd`` (VERDICT r2/r3: the Python RDD wrapper
    materializes the physical plan AND sets up Python serialization on
    every operator call):

    * file-backed plans (``inputFiles`` non-empty) return unchanged — the
      session sets ``spark.sql.files.minPartitionNum`` so Spark itself
      splits splittable formats (parquet/csv) to cluster parallelism; a
      repartition here would only add a shuffle. (Non-splittable inputs
      such as gzip CSV keep their file count; callers feeding those into
      compute-heavy ops should repartition explicitly.)
    * in-memory / shuffled plans probe the JVM-side lazy
      ``queryExecution.toRdd`` partition count — no Python RDD creation,
      and the lazy val is shared with any later action on the same frame.
    """
    sc = df.sparkSession.sparkContext
    target = min_parts or sc.defaultParallelism
    try:
        if df.inputFiles():
            return df
        n = df._jdf.queryExecution().toRdd().getNumPartitions()
    except Exception:
        return df  # connect-mode or exotic plan: leave as-is
    if n < max(2, target // 2):
        return df.repartition(target)
    return df
