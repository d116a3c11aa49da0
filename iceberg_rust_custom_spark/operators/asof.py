"""As-of / range join — an operator Spark lacks natively.

Composition of built-ins (preferred over applyInPandas per the build
rules): bucketize the time axis, equi-join on (key, bucket) against the
probe bucket plus preceding lookback buckets, then pick the latest valid
right row per left row with max_by. Shuffles are keyed by (key, bucket) —
co-partitioned and skew-resistant; nothing is O(N_left × N_right).

For unbounded as-of (no tolerance), pass a bucket_seconds larger than the
maximum expected gap, or use tolerance_seconds to bound the lookback — the
DuckDB oracle for this operator is a native ASOF JOIN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    key_col: str,
    tolerance_seconds: int | None = None,
    bucket_seconds: int = 3600,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row: the most recent right row with right.ts <= left.ts
    (same key), within tolerance_seconds (default: one bucket's lookback)."""
    lookback = 1 if tolerance_seconds is None else max(1, -(-tolerance_seconds // bucket_seconds))

    l = left.withColumn("_lid", F.monotonically_increasing_id()).withColumn(
        "_lb", F.floor(F.col(ts_col).cast("timestamp").cast("double") / bucket_seconds)
    )
    rcols = [c for c in right.columns if c not in (key_col, ts_col)]
    r = right.select(
        F.col(key_col).alias("_rkey"),
        F.col(ts_col).alias("_rts"),
        *[F.col(c).alias(right_prefix + c) for c in rcols],
    ).withColumn("_rb", F.floor(F.col("_rts").cast("timestamp").cast("double") / bucket_seconds))

    l_exp = l.withColumn("_jb", F.explode(F.array(*[F.col("_lb") - F.lit(i) for i in range(lookback + 1)])))
    cond = (l_exp[key_col] == r["_rkey"]) & (F.col("_jb") == F.col("_rb")) & (F.col("_rts") <= l_exp[ts_col])
    if tolerance_seconds is not None:
        cond = cond & (
            l_exp[ts_col].cast("timestamp").cast("double") - F.col("_rts").cast("timestamp").cast("double") <= F.lit(tolerance_seconds)
        )
    cand = l_exp.join(r, cond, "inner")

    payload = F.struct(F.col("_rts").alias("matched_ts"), *[F.col(right_prefix + c) for c in rcols])
    best = cand.groupBy("_lid").agg(F.max_by(payload, F.col("_rts")).alias("_m"))
    out = (
        l.join(best, "_lid", "left")
        .select(
            *[F.col(c) for c in left.columns],
            F.col("_m.matched_ts").alias(right_prefix + ts_col),
            *[F.col(f"_m.{right_prefix}{c}").alias(right_prefix + c) for c in rcols],
        )
    )
    return out
