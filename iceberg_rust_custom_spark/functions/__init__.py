from iceberg_rust_custom_spark.functions.hashing import md5h32, md5h32_sql, md5h32_spark_sql

__all__ = ["md5h32", "md5h32_sql", "md5h32_spark_sql"]
