"""View + materialized-view tests, modeled on the reference's MV refresh
harness (datafusion_iceberg/src/materialized_view.rs:235-545): create sources,
MV over them, assert exact aggregates, append to a source, check staleness,
refresh, assert updated aggregates."""

import datetime as dt

import pytest

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

ORDERS_SCHEMA = Schema(
    0,
    (
        NestedField(1, "id", "long", True),
        NestedField(2, "customer_id", "long", True),
        NestedField(3, "product_id", "long", True),
        NestedField(4, "date", "date", True),
        NestedField(5, "amount", "int", True),
    ),
)

BATCH1 = [
    (1, 1, 1, dt.date(2020, 1, 1), 1),
    (2, 2, 1, dt.date(2020, 1, 1), 1),
    (3, 3, 1, dt.date(2020, 1, 1), 3),
    (4, 1, 2, dt.date(2020, 2, 2), 1),
    (5, 1, 1, dt.date(2020, 2, 2), 2),
    (6, 3, 3, dt.date(2020, 2, 2), 3),
]
BATCH2 = [
    (7, 1, 3, dt.date(2020, 1, 3), 1),
    (8, 2, 1, dt.date(2020, 1, 3), 2),
    (9, 2, 2, dt.date(2020, 1, 3), 1),
]


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "warehouse"))


def test_sql_view(engine, spark):
    t = engine.create_table("test.orders", ORDERS_SCHEMA)
    t.append(spark.createDataFrame(BATCH1, ORDERS_SCHEMA.spark_schema()))
    engine.create_view("test.orders_view", "SELECT product_id, amount FROM test.orders WHERE product_id < 3")
    df = engine.scan_view("test.orders_view")
    assert df.count() == 5
    # view replays stored SQL → reflects source appends immediately
    t.append(spark.createDataFrame(BATCH2, ORDERS_SCHEMA.spark_schema()))
    assert engine.scan_view("test.orders_view").count() == 7  # +2 rows with product_id < 3


def test_materialized_view_refresh(engine, spark):
    """Mirror of materialized_view.rs: MV = filtered projection; stale after
    source append; refresh updates storage; fresh MV skips recompute."""
    t = engine.create_table("test.orders", ORDERS_SCHEMA)
    t.append(spark.createDataFrame(BATCH1, ORDERS_SCHEMA.spark_schema()))
    engine.create_materialized_view(
        "test.orders_mv", "SELECT product_id, SUM(amount) AS total FROM test.orders GROUP BY product_id"
    )
    got = {r["product_id"]: r["total"] for r in engine.scan_materialized_view("test.orders_mv").collect()}
    assert got == {1: 7, 2: 1, 3: 3}

    fresh = engine.materialized_view_freshness("test.orders_mv")
    assert fresh["test.orders"] == "fresh"
    assert engine.refresh_materialized_view("test.orders_mv") is False  # no-op when fresh

    t.append(spark.createDataFrame(BATCH2, ORDERS_SCHEMA.spark_schema()))
    assert engine.materialized_view_freshness("test.orders_mv")["test.orders"] == "outdated"
    assert engine.refresh_materialized_view("test.orders_mv") is True
    got = {r["product_id"]: r["total"] for r in engine.scan_materialized_view("test.orders_mv").collect()}
    assert got == {1: 9, 2: 2, 3: 4}


def test_engine_sql_joins_tables_and_views(engine, spark):
    t = engine.create_table("test.orders", ORDERS_SCHEMA)
    t.append(spark.createDataFrame(BATCH1, ORDERS_SCHEMA.spark_schema()))
    df = engine.sql(
        "SELECT o.product_id, SUM(o.amount) AS total FROM test.orders o GROUP BY o.product_id ORDER BY 1"
    )
    assert [(r["product_id"], r["total"]) for r in df.collect()] == [(1, 7), (2, 1), (3, 3)]
