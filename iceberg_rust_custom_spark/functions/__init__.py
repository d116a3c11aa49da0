from iceberg_rust_custom_spark.functions.hashing import md5h32_sql, stable_token_hash

__all__ = ["md5h32_sql", "stable_token_hash"]
