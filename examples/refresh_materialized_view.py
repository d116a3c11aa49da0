"""Materialized view with freshness tracking + full refresh.

Mirror of the reference's examples/refresh_materialized_view.rs
(datafusion_iceberg/src/materialized_view.rs:29-207 control flow).
Run: PYTHONPATH=.. python refresh_materialized_view.py
"""

import tempfile

from iceberg_rust_custom_spark import Engine
from iceberg_rust_custom_spark.session import get_spark


def main():
    spark = get_spark("example-mv")
    eng = Engine(spark, warehouse=tempfile.mkdtemp())

    eng.sql("CREATE TABLE shop.orders (id BIGINT, product_id BIGINT, amount INT) STORED AS ICEBERG")
    eng.sql("INSERT INTO shop.orders VALUES (1, 1, 1), (2, 1, 2), (3, 2, 3)")
    eng.sql(
        "CREATE MATERIALIZED VIEW shop.totals AS "
        "SELECT product_id, SUM(amount) AS total FROM shop.orders GROUP BY product_id"
    )
    eng.sql("REFRESH MATERIALIZED VIEW shop.totals")
    print("freshness:", eng.materialized_view_freshness("shop.totals"))
    eng.scan_materialized_view("shop.totals").orderBy("product_id").show()

    eng.sql("INSERT INTO shop.orders VALUES (4, 2, 10)")
    print("after append:", eng.materialized_view_freshness("shop.totals"))
    eng.sql("REFRESH MATERIALIZED VIEW shop.totals")
    eng.scan_materialized_view("shop.totals").orderBy("product_id").show()


if __name__ == "__main__":
    main()
