"""Multi-catalog session: ``Engine(catalogs={name: Catalog})`` resolves
``cat.ns.table`` per-catalog with a default for two-part names — the
reference's ``CatalogList`` (iceberg-rust/src/catalog/mod.rs:106-121,
datafusion_iceberg/src/catalog/catalog_list.rs:13-80)."""

import pytest

from iceberg_rust_custom_spark.catalog.file_catalog import FileCatalog
from iceberg_rust_custom_spark.catalog.sql_catalog import SqlCatalog
from iceberg_rust_custom_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    # deliberately heterogeneous backends: file + sql in one session
    return Engine(
        spark,
        catalogs={
            "main": FileCatalog(str(tmp_path / "main_wh")),
            "archive": SqlCatalog(str(tmp_path / "archive.db")),
        },
        default_catalog="main",
        warehouse=str(tmp_path / "shared"),
    )


def _seed(eng, spark):
    eng.sql("CREATE TABLE main.ns.orders (id BIGINT, cust STRING, amt DOUBLE) STORED AS ICEBERG")
    eng.sql("CREATE TABLE archive.ns.customers (cust STRING, region STRING) STORED AS ICEBERG")
    eng.load_table("main.ns.orders").append(
        spark.createDataFrame(
            [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 5.0)], "id long, cust string, amt double"
        )
    )
    eng.load_table("archive.ns.customers").append(
        spark.createDataFrame([("a", "emea"), ("b", "apac")], "cust string, region string")
    )


def test_cross_catalog_join_in_one_statement(eng, spark):
    _seed(eng, spark)
    rows = {
        (r.region, r.total)
        for r in eng.sql(
            "SELECT c.region, SUM(o.amt) AS total "
            "FROM main.ns.orders o JOIN archive.ns.customers c ON o.cust = c.cust "
            "GROUP BY c.region"
        ).collect()
    }
    assert rows == {("emea", 15.0), ("apac", 20.0)}


def test_default_catalog_for_two_part_names(eng, spark):
    _seed(eng, spark)
    # two-part name → default catalog ("main"); both spellings hit one table
    assert eng.sql("SELECT COUNT(*) AS n FROM ns.orders").collect()[0].n == 3
    assert eng.load_table("ns.orders").metadata.table_uuid == (
        eng.load_table("main.ns.orders").metadata.table_uuid
    )
    # the other catalog's table is NOT visible via the default
    assert not eng.table_exists("ns.customers")


def test_registries_are_separate(eng, spark):
    _seed(eng, spark)
    # same bare name in both catalogs: routed independently
    eng.sql("CREATE TABLE archive.ns.orders (id BIGINT) STORED AS ICEBERG")
    eng.load_table("archive.ns.orders").append(
        eng.spark.createDataFrame([(99,)], "id long")
    )
    assert eng.sql("SELECT COUNT(*) AS n FROM archive.ns.orders").collect()[0].n == 1
    assert eng.sql("SELECT COUNT(*) AS n FROM main.ns.orders").collect()[0].n == 3


def test_cross_catalog_ddl_insert_and_metadata_tables(eng, spark):
    _seed(eng, spark)
    eng.sql("INSERT INTO archive.ns.customers VALUES ('c', 'amer')")
    assert eng.sql("SELECT COUNT(*) AS n FROM archive.ns.customers").collect()[0].n == 3
    # metadata table through the catalog prefix
    snaps = eng.sql("SELECT COUNT(*) AS n FROM archive.ns.customers.snapshots").collect()[0].n
    assert snaps >= 2


def test_namespace_ddl_routes_by_catalog(eng):
    eng.sql("CREATE NAMESPACE archive.lake WITH PROPERTIES ('tier'='cold')")
    assert ("lake",) in eng.catalogs["archive"].list_namespaces()
    assert ("lake",) not in eng.catalogs["main"].list_namespaces()
    props = {r.key: r.value for r in eng.sql("DESCRIBE NAMESPACE archive.lake").collect()}
    assert props == {"tier": "cold"}
    eng.sql("DROP NAMESPACE archive.lake")
    assert ("lake",) not in eng.catalogs["archive"].list_namespaces()


def test_rename_within_and_across_catalogs(eng, spark):
    _seed(eng, spark)
    eng.sql("ALTER TABLE main.ns.orders RENAME TO main.ns.orders2")
    assert eng.table_exists("main.ns.orders2") and not eng.table_exists("main.ns.orders")
    with pytest.raises(ValueError, match="across catalogs"):
        eng.sql("ALTER TABLE main.ns.orders2 RENAME TO archive.ns.orders2")


def test_single_catalog_back_compat(spark, tmp_path):
    eng = Engine(spark, warehouse=str(tmp_path))
    eng.sql("CREATE TABLE ns.t (id BIGINT) STORED AS ICEBERG")
    assert eng.table_exists("ns.t")
    assert eng.catalogs == {}
