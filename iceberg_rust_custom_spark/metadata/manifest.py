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
from collections import OrderedDict
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
    if type_name in ("timestamp", "timestamptz", "timestamp_ns", "timestamptz_ns"):
        return _dt.datetime.fromisoformat(v) if isinstance(v, str) else v
    if type_name == "binary" or type_name.startswith("fixed"):
        return bytes.fromhex(v) if isinstance(v, str) else v
    if type_name.startswith("decimal"):
        return _decimal.Decimal(v) if isinstance(v, str) else v
    return v


@dataclass
class DataFile:
    """One data file with its per-column statistics
    (manifest.rs:478-517)."""

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
    # NaN counts per float/double column (manifest.rs:478-517 nan_value_counts)
    # — required for IsNan pruning and NaN-safe bound use on float corpora
    nan_value_counts: dict = field(default_factory=dict)
    # approximate NDV per column (manifest.rs distinct_counts) — CBO-grade
    # stats, collected at write when write.metadata.distinct-counts is on
    distinct_counts: dict = field(default_factory=dict)
    # byte offsets of row-group starts, ascending (split planning hints)
    split_offsets: list | None = None
    # sort order the file was written under (None = unsorted)
    sort_order_id: int | None = None
    # equality-delete key field ids (content=2 files only)
    equality_ids: list | None = None
    # v3 deletion-vector addressing (spec DataFile fields): the data file
    # this delete file applies to, and the byte range of its blob inside
    # the Puffin file_path (table/deletion_vectors.py)
    referenced_data_file: str | None = None
    content_offset: int | None = None
    content_size_in_bytes: int | None = None
    # v3 row lineage: _row_id of this file's first row; rows inherit
    # first_row_id + position. None = not yet assigned (commit assigns for
    # content=0). -1 = rows carry EXPLICIT _row_id/_last_updated_sequence_
    # number columns written into the file (compaction preservation) — the
    # internal encoding of the spec's "null with explicit values" state.
    first_row_id: int | None = None
    # the DATA sequence number this file's rows were committed at. NOT
    # serialized here (the manifest ENTRY owns sequence_number); annotated
    # at read time like spec_id, so rewrite commits can carry untouched
    # files at their ORIGINAL sequence number (Iceberg semantics: a
    # rewrite adds no rows — re-stamping carried files would make
    # incremental reads double-count them and inherit-mode row lineage
    # report the rewrite as the rows' last update).
    data_sequence_number: int | None = None
    # partition spec the file was written under. NOT serialized in the
    # manifest (spec id lives on the manifest-list row, like the
    # reference's manifest_list.rs:26-59); annotated at read time so CoW
    # rewrites can regroup carried files into manifests of THEIR spec
    # without inferring the spec from the partition key-name set (which is
    # ambiguous for parameterized transforms: bucket[4] and bucket[8] over
    # one column generate the same field name — ADVICE r4).
    spec_id: int | None = None


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
        ("nan_value_counts", pa.string()),  # JSON {col: count}, nullable
        ("distinct_counts", pa.string()),  # JSON {col: approx NDV}, nullable
        ("split_offsets", pa.string()),  # JSON [long], nullable
        ("sort_order_id", pa.int32()),  # nullable
        ("equality_ids", pa.string()),  # JSON [int], nullable
        ("referenced_data_file", pa.string()),  # nullable (v3 DV)
        ("content_offset", pa.int64()),  # nullable (v3 DV)
        ("content_size_in_bytes", pa.int64()),  # nullable (v3 DV)
        ("first_row_id", pa.int64()),  # nullable (v3 row lineage)
    ]
)

MANIFEST_LIST_SCHEMA = pa.schema(
    [
        ("manifest_path", pa.string()),
        ("partition_spec_id", pa.int32()),
        ("content", pa.int32()),
        ("sequence_number", pa.int64()),
        ("min_sequence_number", pa.int64()),
        ("added_snapshot_id", pa.int64()),  # snapshot that added this manifest
        ("added_files_count", pa.int32()),
        ("existing_files_count", pa.int32()),
        ("deleted_files_count", pa.int32()),
        ("added_rows_count", pa.int64()),
        ("existing_rows_count", pa.int64()),
        ("partitions", pa.string()),  # JSON dict of FieldSummary per partition name
    ]
)


def entry_to_row(e: ManifestEntry) -> dict:
    """ManifestEntry → one manifest parquet row (inverse of row_to_entry;
    shared with the distributed avro planning path in table/scan.py)."""
    df = e.data_file
    return {
        "status": e.status,
        "snapshot_id": e.snapshot_id,
        "sequence_number": e.sequence_number,
        "content": df.content,
        "file_path": df.file_path,
        "file_format": df.file_format,
        "partition": json.dumps({k: encode_value(v) for k, v in df.partition.items()}),
        "record_count": df.record_count,
        "file_size_in_bytes": df.file_size_in_bytes,
        "column_sizes": json.dumps(df.column_sizes),
        "value_counts": json.dumps(df.value_counts),
        "null_value_counts": json.dumps(df.null_value_counts),
        "lower_bounds": json.dumps({k: encode_value(v) for k, v in df.lower_bounds.items()}),
        "upper_bounds": json.dumps({k: encode_value(v) for k, v in df.upper_bounds.items()}),
        "schema_id": df.schema_id,
        "bloom_filters": json.dumps(df.bloom_filters) if df.bloom_filters else None,
        "nan_value_counts": json.dumps(df.nan_value_counts) if df.nan_value_counts else None,
        "distinct_counts": json.dumps(df.distinct_counts) if df.distinct_counts else None,
        "split_offsets": json.dumps(df.split_offsets) if df.split_offsets else None,
        "sort_order_id": df.sort_order_id,
        "equality_ids": json.dumps(df.equality_ids) if df.equality_ids else None,
        "referenced_data_file": df.referenced_data_file,
        "content_offset": df.content_offset,
        "content_size_in_bytes": df.content_size_in_bytes,
        "first_row_id": df.first_row_id,
    }


def write_manifest(
    path: str,
    entries: list[ManifestEntry],
    spec_id: int = 0,
    schema=None,
    spec=None,
) -> dict:
    """Write a manifest; return a manifest-list row (dict) with FieldSummary
    bounds per partition field (manifest.rs update_partitions). ``spec_id``
    records which partition spec the entries' partition tuples were written
    under (manifest_list.rs:26-59) — scan planning decodes and prunes each
    manifest with its own spec after partition evolution.

    Format dispatch on extension: ``.avro`` → spec-v2 Avro OCF (externally
    readable live; needs schema+spec for binary bounds), else Parquet+JSON
    (Spark-readable pruning)."""
    _manifest_cache_invalidate(path)
    if path.endswith(".avro"):
        from iceberg_rust_custom_spark.metadata.avro_manifest import write_manifest_avro

        return write_manifest_avro(path, entries, spec_id, schema, spec)
    import math as _math

    rows = {name: [] for name in MANIFEST_SCHEMA.names if name}
    summaries: dict[str, dict] = {}
    added_files = existing_files = deleted_files = 0
    added_rows = existing_rows = 0
    min_seq = None
    max_seq = 0
    for e in entries:
        df = e.data_file
        for k, v in entry_to_row(e).items():
            rows[k].append(v)
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
            s = summaries.setdefault(
                pname,
                {
                    "contains_null": False,
                    "contains_nan": False,
                    "lower": None,
                    "upper": None,
                    "_present": 0,
                },
            )
            s["_present"] += 1
            if pval is None:
                s["contains_null"] = True
            elif isinstance(pval, float) and _math.isnan(pval):
                s["contains_nan"] = True
            else:
                if s["lower"] is None or pval < s["lower"]:
                    s["lower"] = pval
                if s["upper"] is None or pval > s["upper"]:
                    s["upper"] = pval
    # a field missing from ANY entry's partition tuple (file written under
    # an older spec) has unknown extent — emitting bounds from the other
    # entries would let manifest pruning drop that file (fuzz catch, r4)
    summaries = {
        k: {kk: vv for kk, vv in v.items() if kk != "_present"}
        for k, v in summaries.items()
        if v["_present"] == len(entries)
    }
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
        nan_value_counts=json.loads(row["nan_value_counts"]) if row.get("nan_value_counts") else {},
        distinct_counts=json.loads(row["distinct_counts"]) if row.get("distinct_counts") else {},
        split_offsets=json.loads(row["split_offsets"]) if row.get("split_offsets") else None,
        sort_order_id=row.get("sort_order_id"),
        equality_ids=json.loads(row["equality_ids"]) if row.get("equality_ids") else None,
        referenced_data_file=row.get("referenced_data_file"),
        content_offset=row.get("content_offset"),
        content_size_in_bytes=row.get("content_size_in_bytes"),
        # pandas surfaces missing int64 as NaN in the distributed path
        first_row_id=(
            int(row["first_row_id"])
            if row.get("first_row_id") is not None and row["first_row_id"] == row["first_row_id"]
            else None
        ),
    )
    df.data_sequence_number = row["sequence_number"]
    return ManifestEntry(row["status"], row["snapshot_id"], row["sequence_number"], df)


# Committed manifests are write-once (uuid-suffixed names, transaction.py:374),
# so a path-keyed cache is sound across scans and snapshots: planning a table
# N times deserializes each manifest once per process instead of once per
# scan, and on s3:// metadata (io/fileio.py::register_s3) it turns repeat
# planning GETs into memory hits. Avro entries inherit sequence numbers from
# their manifest-list row (spec v2), so that inheritance input is part of the
# key. Bounded by total cached ENTRIES, not manifest count — a 100k-file
# manifest is one entry-budget unit, not one slot among 512 small ones.
_MANIFEST_CACHE: "OrderedDict[tuple, list]" = OrderedDict()
_MANIFEST_CACHE_MAX_ENTRIES = 250_000
_manifest_cache_entries = 0
_MANIFEST_CACHE_LOCK = __import__("threading").Lock()


def clear_manifest_cache() -> None:
    global _manifest_cache_entries
    with _MANIFEST_CACHE_LOCK:
        _MANIFEST_CACHE.clear()
        _manifest_cache_entries = 0


def _manifest_cache_invalidate(path: str) -> None:
    """Drop any cached reads of ``path`` — called by every manifest WRITE so
    a rewritten path (e.g. exporting twice into one directory) can never
    serve stale entries."""
    global _manifest_cache_entries
    with _MANIFEST_CACHE_LOCK:
        for key in [k for k in _MANIFEST_CACHE if k[0] == path]:
            _manifest_cache_entries -= len(_MANIFEST_CACHE.pop(key))


def read_manifest(
    path: str, ml_row: dict | None = None, use_cache: bool = True
) -> list[ManifestEntry]:
    """Cached manifest read. Returns FRESH ManifestEntry wrappers on every
    call (callers fix up snapshot/sequence inheritance in place, which must
    not leak into the cache); the DataFile payloads ARE shared across
    callers and must be treated as immutable (ADVICE r4).

    ``use_cache=False`` bypasses the process cache entirely — callers whose
    snapshot working set exceeds the cache capacity pass it (plan_files):
    cyclic insert+evict over an over-capacity manifest set is pure thrash
    (measured at 1M entries: the "cached" walk was SLOWER than cold), and
    those tables route to the distributed planner anyway."""
    global _manifest_cache_entries
    key = (path, ml_row.get("sequence_number") if ml_row else None)
    if use_cache:
        with _MANIFEST_CACHE_LOCK:
            hit = _MANIFEST_CACHE.get(key)
            if hit is not None:
                _MANIFEST_CACHE.move_to_end(key)
        if hit is not None:
            return [
                ManifestEntry(e.status, e.snapshot_id, e.sequence_number, e.data_file)
                for e in hit
            ]
    if path.endswith(".avro"):
        from iceberg_rust_custom_spark.metadata.avro_manifest import read_manifest_avro

        entries = read_manifest_avro(path, ml_row)
    else:
        entries = [row_to_entry(row) for row in FileIO.pq_read_table(path).to_pylist()]
    # annotate the owning partition spec from the manifest-list row (fixed
    # at manifest write, so identical for every reader of this path) — done
    # once, before the entries become shared cache state
    if ml_row is not None and ml_row.get("partition_spec_id") is not None:
        sid = ml_row["partition_spec_id"]
        for e in entries:
            e.data_file.spec_id = sid
    if not use_cache or len(entries) > _MANIFEST_CACHE_MAX_ENTRIES:
        return entries  # fresh objects, never shared — no defensive copy needed
    with _MANIFEST_CACHE_LOCK:
        _MANIFEST_CACHE[key] = entries
        _manifest_cache_entries += len(entries)
        while _manifest_cache_entries > _MANIFEST_CACHE_MAX_ENTRIES and len(_MANIFEST_CACHE) > 1:
            _, old = _MANIFEST_CACHE.popitem(last=False)
            _manifest_cache_entries -= len(old)
    return [ManifestEntry(e.status, e.snapshot_id, e.sequence_number, e.data_file) for e in entries]


def write_manifest_list(path: str, manifest_rows: list[dict], schema=None, specs=None) -> None:
    if path.endswith(".avro"):
        from iceberg_rust_custom_spark.metadata.avro_manifest import write_manifest_list_avro

        write_manifest_list_avro(path, manifest_rows, schema, specs or {})
        return
    cols = {name: [r.get(name) for r in manifest_rows] for name in MANIFEST_LIST_SCHEMA.names}
    FileIO.pq_write_table(pa.table(cols, schema=MANIFEST_LIST_SCHEMA), path, compression="zstd")


def read_manifest_list(path: str) -> list[dict]:
    if path.endswith(".avro"):
        from iceberg_rust_custom_spark.metadata.avro_manifest import read_manifest_list_avro

        return read_manifest_list_avro(path)
    return FileIO.pq_read_table(path).to_pylist()
