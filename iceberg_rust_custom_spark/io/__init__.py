from iceberg_rust_custom_spark.io.fileio import FileIO  # noqa: F401
