"""CSV → partitioned Iceberg-style table → pruned aggregate.

Mirror of the reference's examples/insert_csv.rs:46-118 (external CSV table
→ INSERT INTO iceberg table → sum/group-by), Spark-first.
Run: PYTHONPATH=.. python insert_csv.py
"""

import tempfile

from iceberg_rust_custom_spark import Engine
from iceberg_rust_custom_spark.session import get_spark


def main():
    spark = get_spark("example-insert-csv")
    eng = Engine(spark, warehouse=tempfile.mkdtemp())

    csv = tempfile.NamedTemporaryFile(mode="w", suffix=".csv", delete=False)
    csv.write("1,11,100,1996-01-02\n2,12,250,1996-03-15\n3,11,50,1997-06-01\n")
    csv.close()

    eng.sql(
        f"CREATE EXTERNAL TABLE src (l_orderkey BIGINT, l_partkey BIGINT, "
        f"l_quantity BIGINT, l_shipdate DATE) STORED AS CSV LOCATION '{csv.name}'"
    )
    eng.sql(
        "CREATE TABLE tpch.lineitem (l_orderkey BIGINT, l_partkey BIGINT, "
        "l_quantity BIGINT, l_shipdate DATE) STORED AS ICEBERG PARTITIONED BY (month(l_shipdate))"
    )
    eng.sql("INSERT INTO tpch.lineitem SELECT * FROM src")
    eng.sql(
        "SELECT l_partkey, SUM(l_quantity) AS sum_qty FROM tpch.lineitem GROUP BY l_partkey ORDER BY l_partkey"
    ).show()

    t = eng.load_table("tpch.lineitem")
    print("files planned for 1996 predicate:", t.count_planned_files("l_shipdate < '1997-01-01'"))


if __name__ == "__main__":
    main()
