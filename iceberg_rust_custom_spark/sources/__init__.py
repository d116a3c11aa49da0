"""External sources beyond the engine's own Parquet tables (SURVEY.md §2.1):
CSV (the reference's TPC-H loader path, examples/insert_csv.rs:46-73), JSON
lines, and in-memory batches (examples/dataframe.rs:71-82). All are thin,
schema-explicit wrappers over Spark's distributed readers."""

from iceberg_rust_custom_spark.sources.readers import read_csv, read_json, read_memory

__all__ = ["read_csv", "read_json", "read_memory"]
