"""Event-time window operators over the `events` table (batch), plus the
streaming variants.

The reference has no streaming/event operators (SURVEY.md §2.4); these are
the beyond-reference surface. Batch windows are pure built-ins
(F.window / F.session_window → one shuffle on the window key); streaming
versions add watermarks (streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling(df: DataFrame, ts_col: str, width: str, *group_cols: str) -> DataFrame:
    """Tumbling event-time windows, e.g. width='1 hour'."""
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *group_cols, "n", "sum_value")
    )


def sliding(df: DataFrame, ts_col: str, width: str, slide: str, *group_cols: str) -> DataFrame:
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), *group_cols, "n", "sum_value")
    )


def session(df: DataFrame, ts_col: str, gap: str, *group_cols: str) -> DataFrame:
    """Session windows with a max inactivity gap (F.session_window)."""
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), *group_cols)
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            *group_cols,
            "n",
            "sum_value",
        )
    )


def sessionize_gaps_islands(df: DataFrame, ts_col: str, user_col: str, gap_minutes: int = 30) -> DataFrame:
    """Sessionization via lag + cumulative sum (the classic gaps-and-islands
    formulation) — returns one row per (user, session) with bounds and
    counts. Same result as session() but SQL-oracle-friendly and usable
    where session_window's struct output is awkward."""
    from pyspark.sql import Window as W

    w = W.partitionBy(user_col).orderBy(ts_col)
    gap_s = gap_minutes * 60
    marked = df.withColumn(
        "new_session",
        F.when(
            F.col(ts_col).cast("timestamp").cast("double") - F.lag(F.col(ts_col).cast("timestamp").cast("double")).over(w) > gap_s, 1
        ).otherwise(0),
    ).withColumn("session_idx", F.sum("new_session").over(w.rowsBetween(W.unboundedPreceding, 0)))
    return (
        marked.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
