"""Snapshots, snapshot refs (branches/tags), snapshot log.

Reference: iceberg-rust-spec/src/spec/snapshot.rs:22-48 (Snapshot),
snapshot.rs:50-54 (random positive i64 ids), snapshot.rs:242-281 (refs).
"""

from __future__ import annotations

import secrets
from dataclasses import dataclass, field

MAIN_BRANCH = "main"


def generate_snapshot_id() -> int:
    """Random positive int64, as the reference does (snapshot.rs:50-54)."""
    return secrets.randbits(63) or 1


@dataclass(frozen=True)
class Snapshot:
    snapshot_id: int
    sequence_number: int
    timestamp_ms: int
    manifest_list: str  # path to the manifest-list parquet file
    summary: dict = field(default_factory=dict)
    schema_id: int = 0
    parent_snapshot_id: int | None = None

    def to_dict(self) -> dict:
        d = {
            "snapshot-id": self.snapshot_id,
            "sequence-number": self.sequence_number,
            "timestamp-ms": self.timestamp_ms,
            "manifest-list": self.manifest_list,
            "summary": self.summary,
            "schema-id": self.schema_id,
        }
        if self.parent_snapshot_id is not None:
            d["parent-snapshot-id"] = self.parent_snapshot_id
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "Snapshot":
        return cls(
            snapshot_id=d["snapshot-id"],
            sequence_number=d["sequence-number"],
            timestamp_ms=d["timestamp-ms"],
            manifest_list=d["manifest-list"],
            summary=d.get("summary", {}),
            schema_id=d.get("schema-id", 0),
            parent_snapshot_id=d.get("parent-snapshot-id"),
        )


@dataclass(frozen=True)
class SnapshotReference:
    """Branch or tag (snapshot.rs:242-281)."""

    snapshot_id: int
    ref_type: str = "branch"  # "branch" | "tag"
    min_snapshots_to_keep: int | None = None
    max_snapshot_age_ms: int | None = None
    max_ref_age_ms: int | None = None

    def to_dict(self) -> dict:
        d = {"snapshot-id": self.snapshot_id, "type": self.ref_type}
        for k, v in (
            ("min-snapshots-to-keep", self.min_snapshots_to_keep),
            ("max-snapshot-age-ms", self.max_snapshot_age_ms),
            ("max-ref-age-ms", self.max_ref_age_ms),
        ):
            if v is not None:
                d[k] = v
        return d

    @classmethod
    def from_dict(cls, d: dict) -> "SnapshotReference":
        return cls(
            snapshot_id=d["snapshot-id"],
            ref_type=d.get("type", "branch"),
            min_snapshots_to_keep=d.get("min-snapshots-to-keep"),
            max_snapshot_age_ms=d.get("max-snapshot-age-ms"),
            max_ref_age_ms=d.get("max-ref-age-ms"),
        )
