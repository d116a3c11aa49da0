"""Metadata-plane scale microbench: plan a snapshot of N fabricated data
files (default 200k — 2× the distributed-planning threshold) through both
the driver walk and the distributed mapInPandas planner, with and without
a pruning predicate.

Planning needs only manifests, not data files, so this fabricates
realistic DataFile entries (month-partitioned, per-file id ranges and
stats) across sqrt-law-sized manifests and times:

  * driver plan_files, full + pruned
  * plan_files_distributed, full + pruned
  * agreement of the two pruned sets

Usage: python tools/metadata_scale_bench.py [n_files] [--avro]
Prints one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 200_000
    use_avro = "--avro" in sys.argv

    from iceberg_rust_custom_spark.metadata.expressions import parse_predicate
    from iceberg_rust_custom_spark.metadata.manifest import (
        STATUS_ADDED,
        DataFile,
        ManifestEntry,
        write_manifest,
        write_manifest_list,
    )
    from iceberg_rust_custom_spark.metadata.partition import PartitionField, PartitionSpec
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
    from iceberg_rust_custom_spark.metadata.snapshot import Snapshot
    from iceberg_rust_custom_spark.metadata.table_metadata import TableMetadata
    from iceberg_rust_custom_spark.metadata.transforms import Transform
    from iceberg_rust_custom_spark.session import get_spark
    from iceberg_rust_custom_spark.table.scan import plan_files, plan_files_distributed

    schema = Schema(
        0,
        (
            NestedField(1, "id", "long", True),
            NestedField(2, "ts_month", "int", True),
            NestedField(3, "score", "double", True),
        ),
    )
    spec = PartitionSpec(
        spec_id=0, fields=(PartitionField(2, 1000, "ts_month", Transform("identity")),)
    )

    tmp = tempfile.mkdtemp(prefix="meta_scale_")
    meta_dir = os.path.join(tmp, "metadata")
    os.makedirs(meta_dir)
    ext = ".avro" if use_avro else ".parquet"

    months = 48  # 4 years of monthly partitions
    per_manifest = max(1, int(math.sqrt(n_files)))  # sqrt-law sizing
    rows = []
    entries = []
    mi = 0
    t0 = time.time()
    for i in range(n_files):
        month = i % months
        lo = i * 1000
        df = DataFile(
            file_path=f"{tmp}/data/m{month}/f{i}.parquet",
            partition={"ts_month": month},
            record_count=1000,
            file_size_in_bytes=64 * 1024 * 1024,
            value_counts={"id": 1000, "ts_month": 1000, "score": 1000},
            null_value_counts={"id": 0, "ts_month": 0, "score": 0},
            lower_bounds={"id": lo, "ts_month": month, "score": 0.0},
            upper_bounds={"id": lo + 999, "ts_month": month, "score": 1.0},
            nan_value_counts={"score": 0},
        )
        entries.append(ManifestEntry(STATUS_ADDED, 1, 1, df))
        if len(entries) >= per_manifest:
            row = write_manifest(
                os.path.join(meta_dir, f"manifest-{mi}{ext}"), entries, 0, schema, spec
            )
            row["added_snapshot_id"] = 1
            rows.append(row)
            entries, mi = [], mi + 1
    if entries:
        row = write_manifest(os.path.join(meta_dir, f"manifest-{mi}{ext}"), entries, 0, schema, spec)
        row["added_snapshot_id"] = 1
        rows.append(row)
    ml_path = os.path.join(meta_dir, f"snap-1.manifest-list{ext}")
    write_manifest_list(ml_path, rows, schema=schema, specs={0: spec})
    build_s = round(time.time() - t0, 2)

    md = TableMetadata.new(location=tmp, schema=schema, spec=spec)
    snap = Snapshot(
        snapshot_id=1, sequence_number=1, timestamp_ms=0, manifest_list=ml_path,
        summary={"operation": "append"}, schema_id=0,
    )
    md.snapshots[1] = snap

    spark = get_spark("metadata-scale")
    pred = parse_predicate("ts_month = 7 AND id < 5000000")
    out = {"n_files": n_files, "format": "avro" if use_avro else "parquet",
           "n_manifests": len(rows), "build_s": build_s}

    t0 = time.time()
    full_driver = plan_files(md, snap)
    out["driver_full_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    plan_files(md, snap)
    out["driver_full_cached_s"] = round(time.time() - t0, 2)  # manifest cache hit
    t0 = time.time()
    pruned_driver = plan_files(md, snap, pred)
    out["driver_pruned_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    full_dist = plan_files_distributed(spark, md, snap)
    out["dist_full_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    pruned_dist = plan_files_distributed(spark, md, snap, pred)
    out["dist_pruned_s"] = round(time.time() - t0, 2)

    out["full_count"] = len(full_driver)
    out["pruned_count"] = len(pruned_driver)
    out["agree"] = sorted(f.file_path for f in pruned_driver) == sorted(
        f.file_path for f in pruned_dist
    ) and len(full_dist) == len(full_driver)
    print(json.dumps(out))
    shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
