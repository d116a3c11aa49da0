"""In-memory batch → Iceberg-style table → SQL aggregate.

Mirror of the reference's examples/dataframe.rs:71-82 (ctx.read_batch →
insert → query), Spark-first. Run: PYTHONPATH=.. python dataframe.py
"""

import datetime as dt
import tempfile

from iceberg_rust_custom_spark import Engine
from iceberg_rust_custom_spark.session import get_spark
from iceberg_rust_custom_spark.sources import read_memory


def main():
    spark = get_spark("example-dataframe")
    eng = Engine(spark, warehouse=tempfile.mkdtemp())

    eng.sql(
        "CREATE TABLE public.orders (id BIGINT, customer_id BIGINT, product_id BIGINT, "
        "date DATE, amount INT) STORED AS ICEBERG PARTITIONED BY (day(date))"
    )
    batch = read_memory(
        spark,
        [
            (1, 1, 1, dt.date(2020, 1, 1), 1),
            (2, 2, 1, dt.date(2020, 1, 1), 1),
            (3, 3, 1, dt.date(2020, 1, 1), 3),
            (4, 1, 2, dt.date(2020, 2, 2), 1),
            (5, 1, 1, dt.date(2020, 2, 2), 2),
            (6, 3, 3, dt.date(2020, 2, 2), 3),
        ],
        "id bigint, customer_id bigint, product_id bigint, date date, amount int",
    )
    eng.insert("public.orders", batch)

    # the reference's canonical assertion query (table.rs:691)
    eng.sql(
        "SELECT product_id, SUM(amount) AS total FROM public.orders GROUP BY product_id ORDER BY product_id"
    ).show()


if __name__ == "__main__":
    main()
