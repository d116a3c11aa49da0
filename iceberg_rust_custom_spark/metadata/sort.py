"""Sort orders (reference: iceberg-rust-spec/src/spec/sort.rs:17-68).

Stored in table metadata; applied at write time via sortWithinPartitions
(the reference stores but never applies them — we do apply, an improvement
that yields better min/max clustering for file skipping).
"""

from __future__ import annotations

from dataclasses import dataclass

from iceberg_rust_custom_spark.metadata.transforms import Transform


@dataclass(frozen=True)
class SortField:
    source_id: int
    transform: Transform = Transform("identity")
    direction: str = "asc"  # "asc" | "desc"
    null_order: str = "nulls-first"  # "nulls-first" | "nulls-last"

    def to_dict(self) -> dict:
        return {
            "source-id": self.source_id,
            "transform": self.transform.name,
            "direction": self.direction,
            "null-order": self.null_order,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "SortField":
        return cls(d["source-id"], Transform(d.get("transform", "identity")), d["direction"], d["null-order"])


@dataclass(frozen=True)
class SortOrder:
    order_id: int = 0
    fields: tuple = ()

    def to_dict(self) -> dict:
        return {"order-id": self.order_id, "fields": [f.to_dict() for f in self.fields]}

    @classmethod
    def from_dict(cls, d: dict) -> "SortOrder":
        return cls(d["order-id"], tuple(SortField.from_dict(f) for f in d["fields"]))
