"""Partition specs (reference: iceberg-rust-spec/src/spec/partition.rs:137-172)."""

from __future__ import annotations

import re
from dataclasses import dataclass

from iceberg_rust_custom_spark.metadata.schema import Schema
from iceberg_rust_custom_spark.metadata.transforms import Transform

PARTITION_COL_PREFIX = "_p_"  # physical column name used in partitionBy paths


@dataclass(frozen=True)
class PartitionField:
    source_id: int  # field id in the table schema
    field_id: int  # unique id of the partition field (1000+)
    name: str  # e.g. "l_shipdate_month"
    transform: Transform

    def to_dict(self) -> dict:
        return {
            "source-id": self.source_id,
            "field-id": self.field_id,
            "name": self.name,
            "transform": self.transform.name,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "PartitionField":
        return cls(d["source-id"], d["field-id"], d["name"], Transform(d["transform"]))

    @property
    def physical_name(self) -> str:
        return PARTITION_COL_PREFIX + self.name


@dataclass(frozen=True)
class PartitionSpec:
    spec_id: int = 0
    fields: tuple = ()

    def to_dict(self) -> dict:
        return {"spec-id": self.spec_id, "fields": [f.to_dict() for f in self.fields]}

    @classmethod
    def from_dict(cls, d: dict) -> "PartitionSpec":
        return cls(d["spec-id"], tuple(PartitionField.from_dict(f) for f in d["fields"]))

    @classmethod
    def build(
        cls,
        schema: Schema,
        *specs: tuple,
        spec_id: int = 0,
        first_field_id: int = 1000,
        reuse: dict | None = None,
    ) -> "PartitionSpec":
        """specs: (source_column_name, transform_name) pairs, e.g.
        ("l_shipdate", "month") or ("l_partkey", "bucket[16]"); a bare
        string is accepted as shorthand — "col" means identity and
        "month(col)" the DDL transform syntax.

        ``reuse`` maps (source_id, transform_name) → existing PartitionField;
        evolution passes it so a field shared with a prior spec keeps its
        field id AND name (the Iceberg evolution rule — same transform, same
        identity), while genuinely new fields get ids from
        ``first_field_id`` up."""
        fields = []
        next_id = first_field_id
        for spec in specs:
            if isinstance(spec, str):
                # bare column name → identity; "month(col)" → (col, month);
                # two-arg DDL forms "bucket(4, id)" / "truncate(2, k)" —
                # exactly what SHOW CREATE TABLE emits — → (id, bucket[4])
                s = spec.strip()
                m = re.fullmatch(r"(\w+)\(\s*(\w+)\s*\)", s)
                m2 = re.fullmatch(r"(\w+)\(\s*(\d+)\s*,\s*(\w+)\s*\)", s)
                if m:
                    col, tname = m.group(2), m.group(1)
                elif m2:
                    col, tname = m2.group(3), f"{m2.group(1)}[{m2.group(2)}]"
                elif "(" in s:
                    raise ValueError(f"unrecognized partition spec string: {s!r}")
                else:
                    col, tname = s, "identity"
            else:
                col, tname = spec
            src = schema.field_by_name(col)
            t = Transform(tname)
            prior = (reuse or {}).get((src.field_id, tname))
            if prior is not None:
                fields.append(prior)
                continue
            suffix = "" if tname == "identity" else "_" + tname.split("[")[0]
            fields.append(PartitionField(src.field_id, next_id, f"{col}{suffix}", t))
            next_id += 1
        return cls(spec_id=spec_id, fields=tuple(fields))

    @property
    def is_partitioned(self) -> bool:
        return len(self.fields) > 0

    def source_names(self, schema: Schema) -> list[str]:
        return [schema.field_by_id(f.source_id).name for f in self.fields]
