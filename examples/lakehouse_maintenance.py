"""Row-level ops, CDC, incremental MV refresh and maintenance — the
beyond-reference surface in one runnable tour (the reference leaves delete,
incremental refresh, snapshot expiry and manifest rewrite unimplemented:
README.md:22-46, operation.rs:68-81, materialized_view.rs:147-159).

Run: PYTHONPATH=.. python lakehouse_maintenance.py
"""

import tempfile

from iceberg_rust_custom_spark import Engine, compact, delete_by_key, merge_upsert
from iceberg_rust_custom_spark.session import get_spark


def main():
    spark = get_spark("example-maintenance")
    eng = Engine(spark, warehouse=tempfile.mkdtemp())

    eng.sql("CREATE TABLE lake.users (id BIGINT, name STRING, score DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("lake.users")
    t.append(spark.createDataFrame([(i, f"u{i}", 0.0) for i in range(100)], "id long, name string, score double"))
    anchor = t.metadata.last_sequence_number

    # merge-on-read DELETE: tombstones, no data rewrite
    eng.sql("ALTER TABLE lake.users SET TBLPROPERTIES ('write.delete.mode'='merge-on-read')")
    eng.sql("DELETE FROM lake.users WHERE id < 10")

    # UPDATE (copy-on-write, pruned rewrite)
    eng.sql("UPDATE lake.users SET score = score + 1 WHERE id >= 90")

    # equality delete: O(keys), reads nothing
    delete_by_key(t.refresh(), [42, 43], key_cols=["id"])

    # MERGE upsert (merge-on-read flavor)
    src = spark.createDataFrame([(50, "updated", 9.9), (200, "new", 1.0)], "id long, name string, score double")
    merge_upsert(t.refresh(), src, ["id"], mode="merge-on-read")

    print("rows now:", t.refresh().scan().count())

    # incremental MV refresh over an append-only source
    eng.sql("CREATE TABLE lake.events (k BIGINT, amt BIGINT) STORED AS ICEBERG")
    eng.sql("INSERT INTO lake.events VALUES (1, 10), (2, 5)")
    eng.sql("CREATE MATERIALIZED VIEW lake.totals AS SELECT k, SUM(amt) AS total FROM lake.events GROUP BY k")
    eng.sql("INSERT INTO lake.events VALUES (1, 7)")
    print("refresh mode:", eng.refresh_materialized_view("lake.totals"))  # incremental-aggregate
    eng.scan_materialized_view("lake.totals").show()

    # maintenance: fold tombstones in, expire, sweep
    compact(t.refresh())
    eng.sql("VACUUM lake.users")
    print("files after compact:", t.refresh().files().count())


if __name__ == "__main__":
    main()
