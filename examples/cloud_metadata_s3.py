"""Cloud-lakehouse wiring, runnable offline: catalog pointers commit via S3
conditional PUT, table metadata (metadata.json, manifests, manifest lists)
lives on s3://, data files go wherever Spark writes (s3a:// on a real
cluster; a local dir here). Since r11 the DATA plane is object-store-safe
end to end: post-write enumeration, footer-stats collection, MoR delete
writers, and orphan cleanup all route through the scheme-routed lister
(io/lister.py — registered FileIO backends, else the JVM Hadoop
FileSystem), so an s3a:// table location works for appends, row-level
deletes, and cleanup, not just reads. moto provides the in-process S3 —
swap ``moto.mock_aws`` + the explicit client for plain ``register_s3()``
and a real bucket to go live.

Run: PYTHONPATH=.. python cloud_metadata_s3.py
"""

import tempfile

import boto3
import moto

from pyspark.sql import functions as F  # noqa: F401

from iceberg_rust_custom_spark.catalog.object_store import ObjectStoreCatalog, S3ObjectStore
from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.io.fileio import FileIO, register_s3
from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
from iceberg_rust_custom_spark.session import get_spark


def main():
    spark = get_spark("example-cloud-metadata")
    with moto.mock_aws():
        s3 = boto3.client("s3", region_name="us-east-1")
        s3.create_bucket(Bucket="lakehouse")
        register_s3(client=s3)
        try:
            catalog = ObjectStoreCatalog(S3ObjectStore(s3, "lakehouse", "catalog"))
            eng = Engine(spark, catalog=catalog, warehouse="s3://lakehouse/tables")

            sch = Schema(
                0,
                (
                    NestedField(1, "id", "long", True),
                    NestedField(2, "region", "string", True),
                ),
            )
            data_dir = tempfile.mkdtemp(prefix="cloud_data_")
            t = eng.create_table(
                "sales.events",
                sch,
                partition_by=[("region", "identity")],
                properties={"write.data.path": data_dir},
            )
            t.append(
                spark.createDataFrame(
                    [(i, r) for i in range(20) for r in ("eu", "us")], sch.spark_schema()
                )
            )
            eu = t.scan("region = 'eu'").count()
            print(f"rows: {t.scan().count()}, eu rows: {eu}")
            keys = s3.list_objects_v2(Bucket="lakehouse")["KeyCount"]
            print(f"objects on S3 (pointers + metadata + manifests): {keys}")
            print(f"data files stayed local under {data_dir}")
        finally:
            FileIO._schemes.pop("s3", None)


if __name__ == "__main__":
    main()
