from iceberg_rust_custom_spark.views.view import MaterializedView, View, ViewMetadata

__all__ = ["View", "MaterializedView", "ViewMetadata"]
