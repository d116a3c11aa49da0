"""Skew mitigation for hot keys — explicit salting operators.

AQE's skew-join splitting (spark.sql.adaptive.skewJoin) handles most
cases at runtime; these operators are for the plans AQE can't fix: a
shuffled hash/sort-merge join where ONE key holds >30% of the rows (AQE
splits the partition, but every split still pairs with the full matching
right side — fine), or a groupBy where a single group overwhelms its
reducer (AQE cannot split a single group).

* salted_join: left rows get a uniform salt in [0, n); the (small) right
  side is replicated n× with every salt value. The join key becomes
  (key, salt) → the hot key's rows spread over n reducers. Result is
  row-identical to the unsalted join — so it gates against the plain-SQL
  oracle.
* salted_agg: two-phase aggregation — partial aggregate on (key, salt),
  final merge on key. Works for any algebraic aggregate expressed as
  (partial_expr, merge_expr) pairs; the helper covers sum/count/min/max.

Salting is deterministic here (hash of a row id modulo n, not rand()) so
retried tasks and the DuckDB oracle see stable results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_col(df: DataFrame, n: int) -> F.Column:
    # deterministic per-row salt: hash all columns (retry-stable, unlike rand())
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to a hot left key. The right side is replicated
    n_salts× (keep it the smaller side); rows join on (on…, _salt).
    Returns exactly the columns a plain left.join(right, on, how) would."""
    if how in ("right", "rightouter", "right_outer", "full", "outer", "fullouter", "full_outer"):
        # unmatched replicated right rows would surface n_salts times
        raise ValueError(f"salted_join cannot preserve {how!r} semantics; salt the other side")
    l = left.withColumn("_salt", _salt_col(left, n_salts))
    r = right.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return l.join(r, on=[*on, "_salt"], how=how).drop("_salt")


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    sums: dict[str, F.Column] | None = None,
    counts: bool | str = False,
    mins: dict[str, F.Column] | None = None,
    maxs: dict[str, F.Column] | None = None,
    n_salts: int = 32,
) -> DataFrame:
    """Two-phase grouped aggregation: partial on (group…, salt) spreads a
    hot group over n_salts reducers, final merge on group…. Supports the
    algebraic aggregates (sum/count/min/max) whose merge is themselves.
    counts: True → 'count' column, or a string naming it."""
    salted = df.withColumn("_salt", _salt_col(df, n_salts))
    partial_aggs, final_aggs = [], []
    for name, expr in (sums or {}).items():
        partial_aggs.append(F.sum(expr).alias(f"_p_{name}"))
        final_aggs.append(F.sum(f"_p_{name}").alias(name))
    if counts:
        cname = counts if isinstance(counts, str) else "count"
        partial_aggs.append(F.count(F.lit(1)).alias("_p__cnt"))
        final_aggs.append(F.sum("_p__cnt").alias(cname))
    for name, expr in (mins or {}).items():
        partial_aggs.append(F.min(expr).alias(f"_pm_{name}"))
        final_aggs.append(F.min(f"_pm_{name}").alias(name))
    for name, expr in (maxs or {}).items():
        partial_aggs.append(F.max(expr).alias(f"_px_{name}"))
        final_aggs.append(F.max(f"_px_{name}").alias(name))
    if not partial_aggs:
        raise ValueError("no aggregates requested")
    partial = salted.groupBy(*group_cols, "_salt").agg(*partial_aggs)
    return partial.groupBy(*group_cols).agg(*final_aggs)
