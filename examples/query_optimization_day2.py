"""Day-2 operations on an engine table: runtime-filtered joins, incremental
ANALYZE statistics, and snapshot rollback.

Three capabilities a 100 TB deployment leans on daily:

1. **Runtime join-key file pruning** (`Table.join_scan`) — the dynamic-
   partition-pruning analogue: probe the filtered dimension once for its
   join keys and plan only the fact files whose stats overlap them.
2. **Incremental ANALYZE** (`Table.analyze`) — per-column NDV as mergeable
   HLL blobs; a stats refresh after an append sketches only the new rows.
3. **Snapshot rollback** (`Table.rollback_to`) — undo a bad commit with a
   metadata-only CAS; the abandoned snapshot stays readable by id.

Run: PYTHONPATH=.. python query_optimization_day2.py
"""

import tempfile

from pyspark.sql import functions as F

from iceberg_rust_custom_spark import Engine
from iceberg_rust_custom_spark.session import get_spark
from iceberg_rust_custom_spark.table.runtime_filter import join_key_predicate


def main():
    spark = get_spark("example-day2")
    eng = Engine(spark, warehouse=tempfile.mkdtemp())

    # A custkey-clustered fact table: range distribution gives files tight,
    # non-overlapping key bounds — the shape runtime filtering rewards.
    orders = spark.range(0, 200_000).select(
        F.col("id").alias("o_id"),
        (F.col("id") % 5_000).alias("custkey"),
        (F.rand(7) * 1000).alias("price"),
    )
    t = eng.create_table(
        "shop.orders",
        orders.schema,
        properties={"write.distribution-mode": "range", "write.range-partitions": "8"},
        sort_by=["custkey"],
    )
    t.append(orders)

    # 1. Runtime filter: a small filtered dim prunes fact files at plan time
    dim = spark.createDataFrame([(k,) for k in range(100, 140)], "custkey long")
    pred = join_key_predicate(dim, "custkey")
    print(
        f"planned files: all={t.count_planned_files()} "
        f"with runtime filter={t.count_planned_files(pred)}"
    )
    joined = t.join_scan(dim, "custkey")
    print("joined rows:", joined.count())

    # 2. Incremental ANALYZE: second call sketches only the appended delta
    t.analyze(["custkey", "o_id"])
    t.append(orders.withColumn("o_id", F.col("o_id") + 200_000))
    t.analyze(["custkey", "o_id"])  # appends-only -> blob merge, no full rescan
    t.statistics_df().show()

    # 3. Rollback: undo the second append (metadata-only), then return
    before = t.metadata.snapshot_for_ref().parent_snapshot_id
    head = t.metadata.snapshot_for_ref().snapshot_id
    t.rollback_to(before)
    print("after rollback:", t.scan().count())
    t.set_current_snapshot(head)
    print("after undo-rollback:", t.scan().count())


if __name__ == "__main__":
    main()
