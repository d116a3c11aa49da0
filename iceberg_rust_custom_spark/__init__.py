"""iceberg_rust_custom_spark — a PySpark-native analytics engine with the
capabilities of Embucket/iceberg-rust-custom (JanKaul iceberg-rust +
DataFusion integration), re-expressed Spark-first.

Two halves, mirroring the reference (see SURVEY.md):

1. A table-format kernel: versioned table metadata (schemas, snapshots,
   partition specs, refs), partitioned Parquet writes with per-file column
   statistics, ACID commits via compare-and-swap, two-level stats pruning,
   compaction, views and materialized views with freshness tracking.
   (reference: iceberg-rust-spec/src/spec/*, iceberg-rust/src/table/*)

2. A query surface: everything the reference delegates to DataFusion
   (datafusion-iceberg-sql/src/context.rs:57-58) is served by Spark SQL /
   DataFrame built-ins, plus LLM-data-pipeline operators (dedup, similarity
   search, text analysis, multimodal plumbing) designed for 100 TB scale.
"""

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.session import get_spark
from iceberg_rust_custom_spark.table.maintenance import (
    compact,
    delete_by_key,
    delete_where,
    expire_snapshots,
    maintain,
    merge_upsert,
    remove_orphan_files,
    rewrite_manifests,
    update_where,
    zorder,
)

__all__ = [
    "Engine",
    "get_spark",
    "compact",
    "delete_by_key",
    "delete_where",
    "expire_snapshots",
    "maintain",
    "merge_upsert",
    "remove_orphan_files",
    "rewrite_manifests",
    "update_where",
    "zorder",
]
__version__ = "0.1.0"
