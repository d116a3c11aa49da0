from iceberg_rust_custom_spark.catalog.base import Catalog, Identifier
from iceberg_rust_custom_spark.catalog.file_catalog import FileCatalog
from iceberg_rust_custom_spark.catalog.glue_catalog import FakeGlueClient, GlueCatalog
from iceberg_rust_custom_spark.catalog.sql_catalog import SqlCatalog

__all__ = ["Catalog", "Identifier", "FileCatalog", "SqlCatalog", "GlueCatalog", "FakeGlueClient"]
