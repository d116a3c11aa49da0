"""Shuffle-free co-located joins via Spark native bucketing.

At 100 TB the dominant cost of a large equi-join is the pairwise shuffle of
both inputs. If both tables are *bucketed* on the join key with the same
bucket count, every bucket's rows are already co-located: Spark's planner
joins bucket i against bucket i with **zero Exchange on either side** (the
scan itself reports hash partitioning). This module wraps that pattern:

* ``write_bucketed(df, name, key, n)`` — materialize a DataFrame as a
  Spark bucketed table (``bucketBy(n, key).sortBy(key)`` — sorting enables
  sort-merge join without a per-task sort).
* ``bucketed_join(spark, left, right, on, ...)`` — join two bucketed
  tables; the resulting plan contains no shuffle for the join itself.

This is the engine-level answer to "is this join broadcast-able, and if
not, can we avoid re-shuffling a fact table every query": bucket the fact
table once at write time, amortize the shuffle across every later join.
Parity note: the reference stores a bucket partition transform
(iceberg-rust-spec/src/spec/partition.rs:27-44) but its single-node engine
never exploits co-location; Spark makes the transform pay rent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str | list,
    n_buckets: int = 16,
    sort: bool = True,
    path: str | None = None,
) -> None:
    """Materialize ``df`` as a Spark bucketed+sorted table (external at
    ``path`` when given, else managed in the session warehouse).

    One shuffle now (hash on the key into n_buckets files per partition),
    zero join/aggregate shuffles on the key afterwards."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.repartition(n_buckets, *keys).write.mode("overwrite").bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | list,
    how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; the plan has no Exchange on the join
    inputs (verify with count_join_exchanges / .explain).

    The MERGE hint pins a sort-merge join: for two *large* bucketed tables
    that is the plan that exploits co-location (a broadcast pick at small
    test scale would disable the bucketed scan and prove nothing; at the
    scale bucketing exists for, SMJ is what the planner picks anyway)."""
    keys = [on] if isinstance(on, str) else list(on)
    return (
        spark.table(left_table)
        .hint("merge")
        .join(spark.table(right_table), on=keys, how=how)
    )


def count_join_exchanges(df: DataFrame) -> int:
    """Number of Exchange operators in the final physical plan (AQE-aware).
    0 for a co-located bucketed join; ≥2 for a plain shuffle join."""
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line)
