"""Manifests and manifest lists, stored as **Parquet** (Spark-readable).

Reference model: iceberg-rust-spec/src/spec/manifest.rs:27-41,478-517
(ManifestEntry/DataFile) and manifest_list.rs:26-85 (ManifestListEntry /
FieldSummary). The reference serializes manifests as Avro; we use Parquet
with JSON-encoded nested stats so that:

* the driver can read/prune them with pyarrow at small scale, and
* at 100 TB scale the same files are directly loadable as Spark DataFrames
  (``spark.read.parquet(metadata_dir)``) so pruning itself distributes —
  SURVEY.md §7 "hard parts" calls this out as a day-one design requirement.

Scalar values inside JSON stats are encoded as: numbers as-is, dates as
"YYYY-MM-DD", timestamps as ISO-8601 strings, bytes as hex. Decoding is
driven by the table schema at pruning time.
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import json
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from iceberg_rust_custom_spark.io.fileio import FileIO

STATUS_EXISTING = 0
STATUS_ADDED = 1
STATUS_DELETED = 2


def encode_value(v):
    if v is None:
        return None
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    if isinstance(v, _decimal.Decimal):
        return str(v)  # exact; decimal bounds round-trip losslessly
    return v


def decode_value(v, type_name: str):
    if v is None:
        return None
    if type_name == "date":
        return _dt.date.fromisoformat(v) if isinstance(v, str) else v
    if type_name in ("timestamp", "timestamptz"):
        return _dt.datetime.fromisoformat(v) if isinstance(v, str) else v
    if type_name == "binary" or type_name.startswith("fixed"):
        return bytes.fromhex(v) if isinstance(v, str) else v
    if type_name.startswith("decimal"):
        return _decimal.Decimal(v) if isinstance(v, str) else v
    return v


@dataclass
class DataFile:
    """One data file with its per-column statistics
    (manifest.rs:478-517 minus unused fields)."""

    file_path: str
    file_format: str = "parquet"
    partition: dict = field(default_factory=dict)  # partition field name -> value
    record_count: int = 0
    file_size_in_bytes: int = 0
    column_sizes: dict = field(default_factory=dict)  # column name -> bytes
    value_counts: dict = field(default_factory=dict)
    null_value_counts: dict = field(default_factory=dict)
    lower_bounds: dict = field(default_factory=dict)  # column name -> value
    upper_bounds: dict = field(default_factory=dict)
    content: int = 0  # 0 = data
    schema_id: int = -1  # schema the file was written under (-1 = unknown/legacy)
    # column name -> list of int64 words: per-file bloom filter for
    # planning-time equality skipping (beyond the reference; functions/bloom.py)
    bloom_filters: dict = field(default_factory=dict)


@dataclass
class ManifestEntry:
    status: int
    snapshot_id: int
    sequence_number: int
    data_file: DataFile


MANIFEST_SCHEMA = pa.schema(
    [
        ("status", pa.int32()),
        ("snapshot_id", pa.int64()),
        ("sequence_number", pa.int64()),
        ("content", pa.int32()),
        ("file_path", pa.string()),
        ("file_format", pa.string()),
        ("partition", pa.string()),  # JSON map
        ("record_count", pa.int64()),
        ("file_size_in_bytes", pa.int64()),
        ("column_sizes", pa.string()),
        ("value_counts", pa.string()),
        ("null_value_counts", pa.string()),
        ("lower_bounds", pa.string()),
        ("upper_bounds", pa.string()),
        ("schema_id", pa.int32()),
        ("bloom_filters", pa.string()),  # JSON {col: [int64 words]}, nullable
    ]
)

MANIFEST_LIST_SCHEMA = pa.schema(
    [
        ("manifest_path", pa.string()),
        ("partition_spec_id", pa.int32()),
        ("content", pa.int32()),
        ("sequence_number", pa.int64()),
        ("min_sequence_number", pa.int64()),
        ("added_files_count", pa.int32()),
        ("existing_files_count", pa.int32()),
        ("deleted_files_count", pa.int32()),
        ("added_rows_count", pa.int64()),
        ("existing_rows_count", pa.int64()),
        ("partitions", pa.string()),  # JSON list of FieldSummary dicts
    ]
)


def write_manifest(path: str, entries: list[ManifestEntry], spec_id: int = 0) -> dict:
    """Write manifest parquet; return a manifest-list row (dict) with
    FieldSummary bounds per partition field (manifest.rs update_partitions).
    ``spec_id`` records which partition spec the entries' partition tuples
    were written under (manifest_list.rs:26-59) — scan planning decodes and
    prunes each manifest with its own spec after partition evolution."""
    rows = {name: [] for name in MANIFEST_SCHEMA.names}
    summaries: dict[str, dict] = {}
    added_files = existing_files = deleted_files = 0
    added_rows = existing_rows = 0
    min_seq = None
    max_seq = 0
    for e in entries:
        df = e.data_file
        rows["status"].append(e.status)
        rows["snapshot_id"].append(e.snapshot_id)
        rows["sequence_number"].append(e.sequence_number)
        rows["content"].append(df.content)
        rows["file_path"].append(df.file_path)
        rows["file_format"].append(df.file_format)
        rows["partition"].append(json.dumps({k: encode_value(v) for k, v in df.partition.items()}))
        rows["record_count"].append(df.record_count)
        rows["file_size_in_bytes"].append(df.file_size_in_bytes)
        rows["column_sizes"].append(json.dumps(df.column_sizes))
        rows["value_counts"].append(json.dumps(df.value_counts))
        rows["null_value_counts"].append(json.dumps(df.null_value_counts))
        rows["lower_bounds"].append(json.dumps({k: encode_value(v) for k, v in df.lower_bounds.items()}))
        rows["upper_bounds"].append(json.dumps({k: encode_value(v) for k, v in df.upper_bounds.items()}))
        rows["schema_id"].append(df.schema_id)
        rows["bloom_filters"].append(json.dumps(df.bloom_filters) if df.bloom_filters else None)
        if e.status == STATUS_ADDED:
            added_files += 1
            added_rows += df.record_count
        elif e.status == STATUS_EXISTING:
            existing_files += 1
            existing_rows += df.record_count
        else:
            deleted_files += 1
        min_seq = e.sequence_number if min_seq is None else min(min_seq, e.sequence_number)
        max_seq = max(max_seq, e.sequence_number)
        for pname, pval in df.partition.items():
            s = summaries.setdefault(pname, {"contains_null": False, "lower": None, "upper": None})
            if pval is None:
                s["contains_null"] = True
            else:
                if s["lower"] is None or pval < s["lower"]:
                    s["lower"] = pval
                if s["upper"] is None or pval > s["upper"]:
                    s["upper"] = pval
    FileIO.pq_write_table(pa.table(rows, schema=MANIFEST_SCHEMA), path, compression="zstd")
    return {
        "manifest_path": path,
        "partition_spec_id": spec_id,
        "content": 0,
        "sequence_number": max_seq,
        "min_sequence_number": min_seq if min_seq is not None else 0,
        "added_files_count": added_files,
        "existing_files_count": existing_files,
        "deleted_files_count": deleted_files,
        "added_rows_count": added_rows,
        "existing_rows_count": existing_rows,
        "partitions": json.dumps(
            {k: {**v, "lower": encode_value(v["lower"]), "upper": encode_value(v["upper"])} for k, v in summaries.items()}
        ),
    }


def row_to_entry(row: dict) -> ManifestEntry:
    """One manifest parquet row → ManifestEntry (shared by the driver walk
    and the distributed planning path in table/scan.py)."""
    df = DataFile(
        file_path=row["file_path"],
        file_format=row["file_format"],
        partition=json.loads(row["partition"]),
        record_count=row["record_count"],
        file_size_in_bytes=row["file_size_in_bytes"],
        column_sizes=json.loads(row["column_sizes"]),
        value_counts=json.loads(row["value_counts"]),
        null_value_counts=json.loads(row["null_value_counts"]),
        lower_bounds=json.loads(row["lower_bounds"]),
        upper_bounds=json.loads(row["upper_bounds"]),
        content=row["content"],
        schema_id=row.get("schema_id", -1) if row.get("schema_id") is not None else -1,
        bloom_filters=json.loads(row["bloom_filters"]) if row.get("bloom_filters") else {},
    )
    return ManifestEntry(row["status"], row["snapshot_id"], row["sequence_number"], df)


def read_manifest(path: str) -> list[ManifestEntry]:
    return [row_to_entry(row) for row in FileIO.pq_read_table(path).to_pylist()]


def write_manifest_list(path: str, manifest_rows: list[dict]) -> None:
    cols = {name: [r.get(name) for r in manifest_rows] for name in MANIFEST_LIST_SCHEMA.names}
    FileIO.pq_write_table(pa.table(cols, schema=MANIFEST_LIST_SCHEMA), path, compression="zstd")


def read_manifest_list(path: str) -> list[dict]:
    return FileIO.pq_read_table(path).to_pylist()
