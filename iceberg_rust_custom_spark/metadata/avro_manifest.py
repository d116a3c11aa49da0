"""Spec-v2 Avro manifests as a *live* table metadata format.

Round-2 verdict, top item: the reference's metadata plane IS Iceberg-spec
Avro (iceberg-rust/src/table/manifest.rs:53-104, manifest_list.rs:62-76) —
any external engine (Spark-Iceberg, Trino, DuckDB-iceberg) reads its tables
in place. Our engine's default manifests are Parquet+JSON (Spark-readable
pruning at scale, metadata/manifest.py); this module makes spec-v2 Avro an
equal *primary* format, selected per table with

    TBLPROPERTIES ('write.metadata.format' = 'avro')

Every commit then writes Avro OCF manifests and manifest lists exactly as
``iceberg_interop.export_snapshot`` would, so the table is externally
readable live — export becomes zero-copy (a metadata.json pointer, no
re-encoding).

Self-description: our writers embed the table schema and partition spec in
the OCF file metadata ("schema", "partition-spec", "partition-spec-id" —
the same keys the reference writes, manifest.rs:125-170; plus
"partition-specs" on manifest lists, an engine extension external readers
ignore). Readers therefore need no side-channel: ``read_manifest(path)``
and ``read_manifest_list(path)`` stay single-argument for both formats.

All record conversion reuses iceberg_interop (one serialization truth).
"""

from __future__ import annotations

import json
import math as _math

from iceberg_rust_custom_spark.io.fileio import FileIO
from iceberg_rust_custom_spark.metadata.avro_codec import read_ocf, write_ocf
from iceberg_rust_custom_spark.metadata.partition import PartitionField, PartitionSpec
from iceberg_rust_custom_spark.metadata.schema import Schema

#: table property selecting the live manifest format ("parquet" | "avro")
METADATA_FORMAT_PROPERTY = "write.metadata.format"


def manifest_ext(properties: dict) -> str:
    """File extension for new manifests/manifest lists under a table's
    configured metadata format."""
    return ".avro" if properties.get(METADATA_FORMAT_PROPERTY) == "avro" else ".parquet"


# ---------------------------------------------------------------------------
# manifests
# ---------------------------------------------------------------------------


def write_manifest_avro(path: str, entries: list, spec_id: int, schema: Schema, spec: PartitionSpec) -> dict:
    """Write a spec-v2 Avro manifest; return the engine-native manifest-list
    row (same shape as the Parquet writer's). Entries must be all-data or
    all-delete — the spec stores delete files in separate manifests with
    ``"content": "deletes"`` file metadata (manifest.rs:125-170)."""
    from iceberg_rust_custom_spark.metadata.iceberg_interop import (
        manifest_entry_schema_v2,
        manifest_entry_to_avro,
        partition_record_schema,
    )
    from iceberg_rust_custom_spark.metadata.manifest import (
        STATUS_ADDED,
        STATUS_EXISTING,
        encode_value,
    )

    contents = {e.data_file.content for e in entries}
    is_deletes = bool(contents) and contents <= {1, 2}
    if len(contents) > 1 and not is_deletes:
        raise ValueError(
            "avro manifests cannot mix data and delete files; split by content"
        )

    avro_schema = manifest_entry_schema_v2(partition_record_schema(schema, spec))
    write_ocf(
        path,
        avro_schema,
        [manifest_entry_to_avro(e, schema, spec) for e in entries],
        metadata={
            "format-version": "2",
            "schema": json.dumps(schema.to_dict()),
            "schema-id": str(schema.schema_id),
            "partition-spec": json.dumps([f.to_dict() for f in spec.fields]),
            "partition-spec-id": str(spec.spec_id),
            "content": "deletes" if is_deletes else "data",
        },
    )

    # native manifest-list row: counters + name-keyed FieldSummary JSON
    added_files = existing_files = deleted_files = 0
    added_rows = existing_rows = 0
    min_seq = None
    max_seq = 0
    summaries: dict[str, dict] = {}
    for e in entries:
        df = e.data_file
        if e.status == STATUS_ADDED:
            added_files += 1
            added_rows += df.record_count
        elif e.status == STATUS_EXISTING:
            existing_files += 1
            existing_rows += df.record_count
        else:
            deleted_files += 1
        seq = e.sequence_number or 0
        min_seq = seq if min_seq is None else min(min_seq, seq)
        max_seq = max(max_seq, seq)
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
    # fields absent from any entry (older-spec file) get NO summary — see
    # the identical guard in manifest.py::write_manifest (fuzz catch, r4)
    summaries = {
        k: {kk: vv for kk, vv in v.items() if kk != "_present"}
        for k, v in summaries.items()
        if v["_present"] == len(entries)
    }
    return {
        "manifest_path": path,
        "manifest_length": FileIO.size(path),
        "partition_spec_id": spec_id,
        "content": 1 if is_deletes else 0,
        "sequence_number": max_seq,
        "min_sequence_number": min_seq if min_seq is not None else 0,
        "added_files_count": added_files,
        "existing_files_count": existing_files,
        "deleted_files_count": deleted_files,
        "added_rows_count": added_rows,
        "existing_rows_count": existing_rows,
        "partitions": json.dumps(
            {
                k: {**v, "lower": encode_value(v["lower"]), "upper": encode_value(v["upper"])}
                for k, v in summaries.items()
            }
        ),
    }


def read_manifest_avro(path: str, ml_row: dict | None = None) -> list:
    """Read a spec-v2 Avro manifest into native ManifestEntries. The
    schema/spec ride in the OCF file metadata (self-describing). When the
    caller has the manifest-list row, v2 inheritance fills NULL
    snapshot_id / sequence_number (ADDED entries only, per spec)."""
    from iceberg_rust_custom_spark.metadata.iceberg_interop import avro_to_manifest_entry
    from iceberg_rust_custom_spark.metadata.manifest import STATUS_ADDED

    _schema, meta, records = read_ocf(path)
    schema = Schema.from_dict(json.loads(meta["schema"].decode("utf-8")))
    spec = PartitionSpec(
        spec_id=int(meta.get("partition-spec-id", b"0")),
        fields=tuple(
            PartitionField.from_dict(f)
            for f in json.loads(meta.get("partition-spec", b"[]").decode("utf-8"))
        ),
    )
    entries = [avro_to_manifest_entry(r, schema, spec) for r in records]
    for e in entries:
        if e.snapshot_id is None:
            e.snapshot_id = (ml_row or {}).get("added_snapshot_id", 0)
        if e.sequence_number is None:
            if e.status == STATUS_ADDED and ml_row is not None:
                e.sequence_number = ml_row.get("sequence_number", 0)
            else:
                # spec v2: inheritance applies ONLY to ADDED entries (and
                # needs the manifest-list row to inherit from). Defaulting a
                # null EXISTING/DELETED sequence to 0 would make the data
                # file look older than every equality delete, so MoR scans
                # could over-delete re-inserted rows (ADVICE r3, medium).
                # Mirror the import path: refuse the manifest. Native
                # writers always emit explicit values (transaction.py:232),
                # so this only ever fires on malformed external manifests.
                raise ValueError(
                    f"manifest entry for {e.data_file.file_path} (status {e.status}) "
                    "has no explicit sequence_number and cannot inherit one "
                    "(spec v2 inheritance applies only to ADDED entries with "
                    "a manifest-list row)"
                )
        # mirror the parquet path (row_to_entry): the file's DATA sequence
        # number rides the DataFile so rewrites can carry it forward
        e.data_file.data_sequence_number = e.sequence_number
    return entries


# ---------------------------------------------------------------------------
# manifest lists
# ---------------------------------------------------------------------------


def write_manifest_list_avro(
    path: str, manifest_rows: list[dict], schema: Schema, specs: dict[int, PartitionSpec]
) -> None:
    """Write native manifest-list rows as a spec-v2 ``manifest_file`` OCF
    (manifest_list.rs:517-645). Name-keyed FieldSummary JSON becomes the
    spec's positional list with binary single-value bounds."""
    from iceberg_rust_custom_spark.metadata.iceberg_interop import (
        manifest_list_schema_v2,
        serialize_single_value,
    )
    from iceberg_rust_custom_spark.metadata.manifest import decode_value

    out = []
    for row in manifest_rows:
        spec = specs.get(row.get("partition_spec_id", 0)) or PartitionSpec()
        summaries = json.loads(row.get("partitions") or "{}")
        parts = []
        for pf in spec.fields:
            s = summaries.get(pf.name)
            rt = None
            try:
                src = schema.field_by_id(pf.source_id)
                tname = src.field_type if isinstance(src.field_type, str) else "string"
                rt = pf.transform.result_type(tname)
            except KeyError:
                pass
            if s is None or rt is None:
                parts.append(
                    {"contains_null": True, "contains_nan": None, "lower_bound": None, "upper_bound": None}
                )
                continue
            lo = decode_value(s.get("lower"), rt)
            hi = decode_value(s.get("upper"), rt)
            parts.append(
                {
                    "contains_null": bool(s.get("contains_null")),
                    "contains_nan": s.get("contains_nan"),
                    "lower_bound": serialize_single_value(lo, rt) if lo is not None else None,
                    "upper_bound": serialize_single_value(hi, rt) if hi is not None else None,
                }
            )
        out.append(
            {
                "manifest_path": row["manifest_path"],
                "manifest_length": row.get("manifest_length") or FileIO.size(row["manifest_path"]),
                "partition_spec_id": row.get("partition_spec_id", 0),
                "content": row.get("content", 0),
                "sequence_number": row.get("sequence_number", 0),
                "min_sequence_number": row.get("min_sequence_number", 0),
                "added_snapshot_id": row.get("added_snapshot_id", 0),
                "added_files_count": row.get("added_files_count", 0),
                "existing_files_count": row.get("existing_files_count", 0),
                "deleted_files_count": row.get("deleted_files_count", 0),
                "added_rows_count": row.get("added_rows_count", 0),
                "existing_rows_count": row.get("existing_rows_count", 0),
                "deleted_rows_count": row.get("deleted_rows_count", 0),
                "partitions": parts or None,
                "key_metadata": None,
            }
        )
    write_ocf(
        path,
        manifest_list_schema_v2(),
        out,
        metadata={
            "format-version": "2",
            # engine extension: self-description so read_manifest_list(path)
            # can rebuild name-keyed summaries without the table metadata
            "schema": json.dumps(schema.to_dict()),
            "partition-specs": json.dumps(
                {sid: [f.to_dict() for f in sp.fields] for sid, sp in specs.items()}
            ),
        },
    )


def read_manifest_list_avro(path: str) -> list[dict]:
    """Read a spec-v2 Avro manifest list into native rows. Positional
    FieldSummaries become name-keyed JSON using the embedded spec metadata;
    files written by other engines (no embedded specs) keep ``partitions``
    empty — manifest-level pruning degrades conservatively, file-level
    pruning still applies."""
    from iceberg_rust_custom_spark.metadata.iceberg_interop import deserialize_single_value
    from iceberg_rust_custom_spark.metadata.manifest import encode_value

    _schema, meta, records = read_ocf(path)
    schema = None
    specs: dict[int, PartitionSpec] = {}
    if "schema" in meta:
        schema = Schema.from_dict(json.loads(meta["schema"].decode("utf-8")))
    if "partition-specs" in meta:
        for sid, fields in json.loads(meta["partition-specs"].decode("utf-8")).items():
            specs[int(sid)] = PartitionSpec(
                spec_id=int(sid), fields=tuple(PartitionField.from_dict(f) for f in fields)
            )

    rows = []
    for rec in records:
        row = {
            "manifest_path": rec["manifest_path"],
            "manifest_length": rec.get("manifest_length", 0),
            "partition_spec_id": rec.get("partition_spec_id", 0),
            "content": rec.get("content", 0),
            "sequence_number": rec.get("sequence_number", 0),
            "min_sequence_number": rec.get("min_sequence_number", 0),
            "added_snapshot_id": rec.get("added_snapshot_id", 0),
            "added_files_count": rec.get("added_files_count", 0),
            "existing_files_count": rec.get("existing_files_count", 0),
            "deleted_files_count": rec.get("deleted_files_count", 0),
            "added_rows_count": rec.get("added_rows_count", 0),
            "existing_rows_count": rec.get("existing_rows_count", 0),
            "deleted_rows_count": rec.get("deleted_rows_count", 0),
            "partitions": None,
        }
        spec = specs.get(row["partition_spec_id"])
        summaries = {}
        if spec is not None and schema is not None and rec.get("partitions"):
            for pf, s in zip(spec.fields, rec["partitions"]):
                rt = None
                try:
                    src = schema.field_by_id(pf.source_id)
                    tname = src.field_type if isinstance(src.field_type, str) else "string"
                    rt = pf.transform.result_type(tname)
                except KeyError:
                    pass
                if rt is None:
                    continue
                lo = s.get("lower_bound")
                hi = s.get("upper_bound")
                summaries[pf.name] = {
                    "contains_null": bool(s.get("contains_null")),
                    "contains_nan": s.get("contains_nan"),
                    "lower": encode_value(deserialize_single_value(lo, rt)) if lo is not None else None,
                    "upper": encode_value(deserialize_single_value(hi, rt)) if hi is not None else None,
                }
        if summaries:
            row["partitions"] = json.dumps(summaries)
        rows.append(row)
    return rows
