"""Schema-explicit source readers.

Explicit schemas are non-negotiable at scale: inference reads the data
twice and can flip types between runs; the reference likewise declares
column types in its CSV DDL (datafusion_iceberg/examples/insert_csv.rs:46-64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def _schema(schema: T.StructType | str) -> T.StructType:
    return T.StructType.fromDDL(schema) if isinstance(schema, str) else schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | str,
    header: bool = False,
    delimiter: str = ",",
) -> DataFrame:
    """CSV source (reference: CREATE EXTERNAL TABLE … STORED AS CSV,
    insert_csv.rs:46-73). Distributed, splittable read; malformed rows fail
    fast (mode=FAILFAST) rather than silently nulling."""
    return (
        spark.read.schema(_schema(schema))
        .option("header", header)
        .option("sep", delimiter)
        .option("mode", "FAILFAST")
        .csv(path)
    )


def read_json(spark: SparkSession, path: str, schema: T.StructType | str) -> DataFrame:
    """JSON-lines source with explicit schema (no inference pass)."""
    return spark.read.schema(_schema(schema)).json(path)


def read_memory(spark: SparkSession, rows: list, schema: T.StructType | str) -> DataFrame:
    """In-memory batch source (reference: ctx.read_batch(RecordBatch),
    examples/dataframe.rs:71-82)."""
    from iceberg_rust_custom_spark.functions.local_rows import local_rows_df

    return local_rows_df(spark, rows, _schema(schema))


def read_orc(spark: SparkSession, path: str, schema: T.StructType | str | None = None) -> DataFrame:
    """ORC source. The reference declares ORC only as a file-format enum
    variant and cannot read it (manifest.rs:295-304, arrow/read.rs:29-43);
    Spark's native vectorized ORC reader makes it a first-class source
    here. Schema optional: ORC files embed their schema exactly (unlike
    CSV/JSON there is no inference pass over the data)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(_schema(schema))
    return reader.orc(path)
