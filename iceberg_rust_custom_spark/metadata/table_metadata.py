"""TableMetadata: the versioned JSON document at the root of every table.

Reference: iceberg-rust-spec/src/spec/table_metadata.rs:51-138 (struct),
iceberg-rust/src/catalog/commit.rs:26-363 (updates/requirements/commit
protocol). One ``v{N}.metadata.json`` per table version; the catalog holds a
pointer that is swapped atomically (CAS).
"""

from __future__ import annotations

import json
import time
import uuid as _uuid
from dataclasses import dataclass, field, replace

from iceberg_rust_custom_spark.metadata.partition import PartitionSpec
from iceberg_rust_custom_spark.metadata.schema import Schema
from iceberg_rust_custom_spark.metadata.snapshot import MAIN_BRANCH, Snapshot, SnapshotReference
from iceberg_rust_custom_spark.metadata.sort import SortOrder

FORMAT_VERSION = 2

def _apply_ns_mode(schema: Schema, props: dict) -> Schema:
    """Derive the schema's engine-side ns-timestamp rendering from the
    CREATE-time property ``write.timestamp-ns.mode``: ``long`` → v3
    timestamp_ns/timestamptz_ns columns surface (and store) as LongType
    nanoseconds, LOSSLESS end-to-end (Spark's timestamp types are µs-only
    — the default mode truncates sub-µs digits at the boundary). The flag
    is re-derived on every metadata load, so it must be set at table
    creation and never toggled once data exists (stored longs would be
    reinterpreted)."""
    if props.get("write.timestamp-ns.mode") == "long" and not schema.ns_long:
        return replace(schema, ns_long=True)
    return schema


DEFAULT_PROPERTIES = {
    # mirrors the reference's writer defaults (iceberg-rust/src/table/mod.rs:49-58,
    # arrow/write.rs:36,278-281)
    "write.parquet.compression-codec": "zstd",
    "write.parquet.compression-level": "1",
    "write.target-file-size-bytes": str(512_000_000),
}


@dataclass(frozen=True)
class TableMetadata:
    table_uuid: str
    location: str
    format_version: int = FORMAT_VERSION
    last_sequence_number: int = 0
    last_updated_ms: int = 0
    last_column_id: int = 0
    schemas: dict = field(default_factory=dict)  # schema_id -> Schema
    current_schema_id: int = 0
    partition_specs: dict = field(default_factory=dict)  # spec_id -> PartitionSpec
    default_spec_id: int = 0
    sort_orders: dict = field(default_factory=dict)  # order_id -> SortOrder
    default_sort_order_id: int = 0
    properties: dict = field(default_factory=dict)
    current_snapshot_id: int | None = None
    snapshots: dict = field(default_factory=dict)  # snapshot_id -> Snapshot
    snapshot_log: tuple = ()  # ({"timestamp-ms", "snapshot-id"}, ...)
    metadata_log: tuple = ()
    refs: dict = field(default_factory=dict)  # name -> SnapshotReference
    # Iceberg spec `statistics` field: [{snapshot-id, statistics-path,
    # file-size-in-bytes, blob-metadata: [{type, snapshot-id,
    # sequence-number, fields, properties}]}] — one entry per analyzed
    # snapshot (ANALYZE TABLE / Table.analyze); beyond the reference, which
    # has no statistics support.
    statistics: tuple = ()
    # Iceberg v3 row lineage: the next _row_id block start to hand out.
    # Commits that add data files reserve [next_row_id, next_row_id + sum of
    # record_counts) and bump this (spec "Row Lineage"; the reference has no
    # v3 support — iceberg-rust-spec tracks format v2 only).
    next_row_id: int = 0

    # ------------------------------------------------------------------ new
    @classmethod
    def new(
        cls,
        location: str,
        schema: Schema,
        spec: PartitionSpec | None = None,
        sort_order: SortOrder | None = None,
        properties: dict | None = None,
    ) -> "TableMetadata":
        spec = spec or PartitionSpec()
        sort_order = sort_order or SortOrder()
        props = dict(DEFAULT_PROPERTIES)
        props.update(properties or {})
        schema = _apply_ns_mode(schema, props)
        return cls(
            table_uuid=str(_uuid.uuid4()),
            location=location,
            last_updated_ms=int(time.time() * 1000),
            last_column_id=schema.max_field_id,
            schemas={schema.schema_id: schema},
            current_schema_id=schema.schema_id,
            partition_specs={spec.spec_id: spec},
            default_spec_id=spec.spec_id,
            sort_orders={sort_order.order_id: sort_order},
            default_sort_order_id=sort_order.order_id,
            properties=props,
        )

    # -------------------------------------------------------------- lookups
    def current_schema(self) -> Schema:
        return self.schemas[self.current_schema_id]

    def metadata_dir(self) -> str:
        """Directory for metadata.json / manifests / manifest lists — the
        Iceberg ``write.metadata.path`` property when set, else
        ``<location>/metadata``. Lets the metadata plane live on a
        different store than the data (e.g. metadata on s3:// via FileIO
        while Spark writes data files locally or via s3a://)."""
        import os as _os

        return self.properties.get("write.metadata.path") or _os.path.join(
            self.location, "metadata"
        )

    def data_dir(self) -> str:
        """Root directory for new data files — the Iceberg
        ``write.data.path`` property when set, else ``<location>/data``."""
        import os as _os

        return self.properties.get("write.data.path") or _os.path.join(self.location, "data")

    def default_spec(self) -> PartitionSpec:
        return self.partition_specs[self.default_spec_id]

    def snapshot_for_ref(self, ref_name: str = MAIN_BRANCH) -> Snapshot | None:
        ref = self.refs.get(ref_name)
        if ref is None:
            if ref_name == MAIN_BRANCH and self.current_snapshot_id is not None:
                return self.snapshots.get(self.current_snapshot_id)
            return None
        return self.snapshots.get(ref.snapshot_id)

    def snapshot_by_id(self, snapshot_id: int) -> Snapshot:
        return self.snapshots[snapshot_id]

    def ancestry(self, ref_name: str = MAIN_BRANCH):
        """Yield snapshots from the ref's head up the parent chain (head
        first). Stops at the first parent no longer retained in the
        snapshot map (expired history)."""
        snap = self.snapshot_for_ref(ref_name)
        while snap is not None:
            yield snap
            if snap.parent_snapshot_id is None:
                return
            snap = self.snapshots.get(snap.parent_snapshot_id)

    def snapshot_as_of(self, timestamp_ms: int) -> Snapshot | None:
        """Time travel: latest snapshot at or before timestamp_ms."""
        best = None
        for entry in self.snapshot_log:
            if entry["timestamp-ms"] <= timestamp_ms:
                best = entry["snapshot-id"]
        return self.snapshots.get(best) if best is not None else None

    # ---------------------------------------------------------------- serde
    def to_dict(self) -> dict:
        return {
            # upgrade-on-write: v1 tables are normalized to the v2 model at
            # load (table_metadata.rs:357-744 reads both; we write only v2)
            "format-version": max(2, self.format_version),
            "last-partition-id": max(
                (pf.field_id for s in self.partition_specs.values() for pf in s.fields),
                default=999,
            ),
            "table-uuid": self.table_uuid,
            "location": self.location,
            "last-sequence-number": self.last_sequence_number,
            "last-updated-ms": self.last_updated_ms,
            "last-column-id": self.last_column_id,
            "schemas": [s.to_dict() for s in self.schemas.values()],
            "current-schema-id": self.current_schema_id,
            "partition-specs": [s.to_dict() for s in self.partition_specs.values()],
            "default-spec-id": self.default_spec_id,
            "sort-orders": [s.to_dict() for s in self.sort_orders.values()],
            "default-sort-order-id": self.default_sort_order_id,
            "properties": self.properties,
            "current-snapshot-id": self.current_snapshot_id,
            "snapshots": [s.to_dict() for s in self.snapshots.values()],
            "snapshot-log": list(self.snapshot_log),
            "metadata-log": list(self.metadata_log),
            "refs": {k: v.to_dict() for k, v in self.refs.items()},
            "statistics": list(self.statistics),
            "next-row-id": self.next_row_id,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "TableMetadata":
        fv = d.get("format-version")
        if fv not in (1, 2, 3):
            raise ValueError(f"unsupported format version: {fv!r}")
        if fv == 1:
            d = _normalize_v1(d)
        props = d.get("properties", {})
        schemas = {
            s["schema-id"]: _apply_ns_mode(Schema.from_dict(s), props)
            for s in d["schemas"]
        }
        current_schema_id = d["current-schema-id"]
        if current_schema_id not in schemas:
            raise ValueError(f"current-schema-id {current_schema_id} not found in schemas")
        return cls(
            format_version=fv,
            table_uuid=d["table-uuid"],
            location=d["location"],
            last_sequence_number=d.get("last-sequence-number", 0),
            last_updated_ms=d.get("last-updated-ms", 0),
            last_column_id=d.get("last-column-id", 0),
            schemas=schemas,
            current_schema_id=current_schema_id,
            partition_specs={s["spec-id"]: PartitionSpec.from_dict(s) for s in d.get("partition-specs", [])},
            default_spec_id=d.get("default-spec-id", 0),
            sort_orders={s["order-id"]: SortOrder.from_dict(s) for s in d.get("sort-orders", [])},
            default_sort_order_id=d.get("default-sort-order-id", 0),
            properties=d.get("properties", {}),
            current_snapshot_id=d.get("current-snapshot-id"),
            snapshots={s["snapshot-id"]: Snapshot.from_dict(s) for s in d.get("snapshots", [])},
            snapshot_log=tuple(d.get("snapshot-log", ())),
            metadata_log=tuple(d.get("metadata-log", ())),
            refs={k: SnapshotReference.from_dict(v) for k, v in d.get("refs", {}).items()},
            statistics=tuple(d.get("statistics", ())),
            next_row_id=d.get("next-row-id", 0),
        )

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=1)

    @classmethod
    def from_json(cls, s: str) -> "TableMetadata":
        return cls.from_dict(json.loads(s))

    # ------------------------------------------------------------- updates
    # Commit protocol mirror of iceberg-rust/src/catalog/commit.rs:252-363
    def apply_updates(self, updates: list[dict]) -> "TableMetadata":
        md = self
        for u in updates:
            action = u["action"]
            if action == "add-snapshot":
                snap = Snapshot.from_dict(u["snapshot"])
                snapshots = dict(md.snapshots)
                snapshots[snap.snapshot_id] = snap
                log = md.snapshot_log + (
                    {"timestamp-ms": snap.timestamp_ms, "snapshot-id": snap.snapshot_id},
                )
                md = replace(
                    md,
                    snapshots=snapshots,
                    snapshot_log=log,
                    last_sequence_number=max(md.last_sequence_number, snap.sequence_number),
                    last_updated_ms=int(time.time() * 1000),
                )
            elif action == "set-snapshot-ref":
                refs = dict(md.refs)
                refs[u["ref-name"]] = SnapshotReference.from_dict(u["reference"])
                md = replace(md, refs=refs)
                if u["ref-name"] == MAIN_BRANCH:
                    md = replace(md, current_snapshot_id=u["reference"]["snapshot-id"])
            elif action == "remove-snapshots":
                ids = set(u["snapshot-ids"])
                md = replace(
                    md,
                    snapshots={k: v for k, v in md.snapshots.items() if k not in ids},
                    snapshot_log=tuple(e for e in md.snapshot_log if e["snapshot-id"] not in ids),
                )
            elif action == "remove-snapshot-ref":
                refs = {k: v for k, v in md.refs.items() if k != u["ref-name"]}
                md = replace(md, refs=refs)
            elif action == "add-schema":
                schema = _apply_ns_mode(Schema.from_dict(u["schema"]), md.properties)
                schemas = dict(md.schemas)
                schemas[schema.schema_id] = schema
                md = replace(md, schemas=schemas, last_column_id=max(md.last_column_id, schema.max_field_id))
            elif action == "set-current-schema":
                if u["schema-id"] not in md.schemas:
                    raise ValueError(f"schema {u['schema-id']} not found")
                md = replace(md, current_schema_id=u["schema-id"])
            elif action == "add-spec":
                spec = PartitionSpec.from_dict(u["spec"])
                specs = dict(md.partition_specs)
                specs[spec.spec_id] = spec
                md = replace(md, partition_specs=specs)
            elif action == "set-default-spec":
                md = replace(md, default_spec_id=u["spec-id"])
            elif action == "add-sort-order":
                so = SortOrder.from_dict(u["sort-order"])
                orders = dict(md.sort_orders)
                orders[so.order_id] = so
                md = replace(md, sort_orders=orders)
            elif action == "set-default-sort-order":
                md = replace(md, default_sort_order_id=u["order-id"])
            elif action == "set-properties":
                props = dict(md.properties)
                props.update(u["updates"])
                md = replace(md, properties=props)
            elif action == "remove-properties":
                props = {k: v for k, v in md.properties.items() if k not in u["removals"]}
                md = replace(md, properties=props)
            elif action == "set-location":
                md = replace(md, location=u["location"])
            elif action == "set-next-row-id":
                # monotone: a stale retry can never shrink the reserved space
                md = replace(md, next_row_id=max(md.next_row_id, u["next-row-id"]))
            elif action == "assign-uuid":
                md = replace(md, table_uuid=u["uuid"])
            elif action == "set-statistics":
                # spec: replaces any existing entry for the same snapshot
                entry = u["statistics"]
                kept = tuple(
                    s for s in md.statistics if s["snapshot-id"] != entry["snapshot-id"]
                )
                md = replace(md, statistics=kept + (entry,))
            elif action == "remove-statistics":
                md = replace(
                    md,
                    statistics=tuple(
                        s for s in md.statistics if s["snapshot-id"] != u["snapshot-id"]
                    ),
                )
            else:
                raise ValueError(f"unknown update action {action!r}")
        return md

    def check_requirements(self, requirements: list[dict]) -> None:
        """AssertRefSnapshotId & friends (commit.rs:53-184). Raises
        CommitConflict on violation."""
        for r in requirements:
            rtype = r["type"]
            if rtype == "assert-ref-snapshot-id":
                ref = self.refs.get(r["ref"])
                actual = ref.snapshot_id if ref else None
                if actual != r.get("snapshot-id"):
                    raise CommitConflict(
                        f"ref {r['ref']!r}: expected snapshot {r.get('snapshot-id')}, found {actual}"
                    )
            elif rtype == "assert-table-uuid":
                if self.table_uuid != r["uuid"]:
                    raise CommitConflict("table uuid mismatch")
            elif rtype == "assert-current-schema-id":
                if self.current_schema_id != r["current-schema-id"]:
                    raise CommitConflict("current schema id changed")
            elif rtype == "assert-default-spec-id":
                if self.default_spec_id != r["default-spec-id"]:
                    raise CommitConflict("default spec id changed")
            elif rtype == "assert-create":
                raise CommitConflict("table already exists")
            else:
                raise ValueError(f"unknown requirement {rtype!r}")


def _normalize_v1(d: dict) -> dict:
    """Rewrite a format-version-1 metadata document into the v2 shape this
    model stores (reference reads both: table_metadata.rs:357-744,
    schema.rs:106-145). v1 singulars — ``schema`` / ``partition-spec`` —
    become the v2 lists; missing ids are assigned (field ids sequentially,
    partition field ids from 1000); v1 snapshots default sequence-number 0.
    Writes always emit v2 (upgrade-on-write)."""
    d = dict(d)
    if "schemas" not in d:
        sch = dict(d.get("schema") or {})
        sch.setdefault("schema-id", 0)
        next_id = 1
        fields = []
        for f in sch.get("fields", ()):
            f = dict(f)
            if "id" not in f:
                f["id"] = next_id
            next_id = max(next_id, f["id"] + 1)
            fields.append(f)
        sch["fields"] = fields
        d["schemas"] = [sch]
        d.setdefault("current-schema-id", sch["schema-id"])
    if "partition-specs" not in d:
        pfields = []
        for i, pf in enumerate(d.get("partition-spec") or ()):
            pf = dict(pf)
            pf.setdefault("field-id", 1000 + i)
            pfields.append(pf)
        d["partition-specs"] = [{"spec-id": 0, "fields": pfields}]
        d.setdefault("default-spec-id", 0)
    if "sort-orders" not in d:
        d["sort-orders"] = [{"order-id": 0, "fields": []}]
        d.setdefault("default-sort-order-id", 0)
    snaps = []
    for s in d.get("snapshots", ()):
        s = dict(s)
        if "manifest-list" not in s:
            raise ValueError(
                "v1 snapshot lists manifests directly (no manifest-list); "
                "rewrite with a manifest list before import"
            )
        s.setdefault("sequence-number", 0)
        s.setdefault("schema-id", d.get("current-schema-id", 0))
        snaps.append(s)
    d["snapshots"] = snaps
    d.setdefault("last-sequence-number", 0)
    return d


class CommitConflict(Exception):
    """Optimistic-concurrency conflict: requirements not met at commit time."""
