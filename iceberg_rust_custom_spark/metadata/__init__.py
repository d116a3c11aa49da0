from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
from iceberg_rust_custom_spark.metadata.transforms import Transform
from iceberg_rust_custom_spark.metadata.partition import PartitionField, PartitionSpec
from iceberg_rust_custom_spark.metadata.snapshot import Snapshot, SnapshotReference
from iceberg_rust_custom_spark.metadata.sort import SortField, SortOrder
from iceberg_rust_custom_spark.metadata.table_metadata import TableMetadata
from iceberg_rust_custom_spark.metadata.manifest import DataFile, ManifestEntry

__all__ = [
    "NestedField",
    "Schema",
    "Transform",
    "PartitionField",
    "PartitionSpec",
    "Snapshot",
    "SnapshotReference",
    "SortField",
    "SortOrder",
    "TableMetadata",
    "DataFile",
    "ManifestEntry",
]
