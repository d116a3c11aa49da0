"""Time-series downsampling with gap-fill — the hypertable-rollup family
of operations (continuous-aggregate shape). The reference has no
time-series operators (SURVEY.md §2.4: "No streams, no graphs, no time
series"); these are north-star additions for event/metric pipelines.

Everything is built-in expressions:
* downsample = floor-truncate the timestamp to the bucket width and
  aggregate — one hash shuffle on (keys…, bucket), map-side partials.
* gap_fill = per-group min/max bucket, `sequence()` + `explode` to
  materialize the dense bucket axis, left join the sparse aggregates back.
  The dense axis is generated per group (no driver loop, no cross join);
  its row count is bounded by groups × span/width.
* locf (last observation carried forward) = `last(value, ignorenulls)`
  over an unbounded-preceding window per group — one extra sort within the
  already-shuffled group partitions, no new shuffle.

At 100 TB the shuffle key (keys…, bucket) is high-cardinality and evenly
spread (time advances); the window for locf partitions by group keys
only, which is the one skew risk — groups with year-long spans at 1s
buckets should be range-partitioned by (group, coarse_time) first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_bucket(ts_col: str, width_seconds: int) -> F.Column:
    """Truncate a timestamp column to fixed-width epoch-aligned buckets
    (spec-correct epoch-relative semantics, like our partition transforms —
    COVERAGE.md 'Deliberate divergences')."""
    secs = F.col(ts_col).cast("timestamp").cast("double")
    return (F.floor(secs / width_seconds) * width_seconds).cast("timestamp")


def downsample(
    df: DataFrame,
    ts_col: str,
    width_seconds: int,
    group_cols: list[str],
    aggs: dict[str, F.Column],
    bucket_name: str = "bucket",
) -> DataFrame:
    """Aggregate rows into fixed-width time buckets per group.
    aggs: output_name -> aggregate Column expression."""
    out = df.withColumn(bucket_name, time_bucket(ts_col, width_seconds))
    return out.groupBy(*group_cols, bucket_name).agg(
        *[c.alias(n) for n, c in aggs.items()]
    )


def gap_fill(
    sparse: DataFrame,
    bucket_col: str,
    width_seconds: int,
    group_cols: list[str],
    fill: dict | None = None,
    locf_cols: list[str] | None = None,
) -> DataFrame:
    """Densify a downsampled frame: emit one row per group per bucket
    between that group's first and last observed bucket.

    fill: col -> constant used for missing buckets (applied first).
    locf_cols: columns filled by carrying the last non-null value forward
    (within the group, ordered by bucket).
    """
    spans = sparse.groupBy(*group_cols).agg(
        F.min(bucket_col).alias("_lo"), F.max(bucket_col).alias("_hi")
    )
    dense = spans.select(
        *group_cols,
        F.explode(
            F.sequence(
                F.col("_lo"),
                F.col("_hi"),
                F.expr(f"INTERVAL {int(width_seconds)} SECONDS"),
            )
        ).alias(bucket_col),
    )
    out = dense.join(sparse, on=[*group_cols, bucket_col], how="left")
    for col, const in (fill or {}).items():
        out = out.withColumn(col, F.coalesce(F.col(col), F.lit(const)))
    if locf_cols:
        w = (
            Window.partitionBy(*group_cols)
            .orderBy(bucket_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for col in locf_cols:
            out = out.withColumn(col, F.last(col, ignorenulls=True).over(w))
    return out
