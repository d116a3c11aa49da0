from iceberg_rust_custom_spark.table.table import Table

__all__ = ["Table"]
