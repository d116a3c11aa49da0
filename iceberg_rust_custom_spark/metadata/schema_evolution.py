"""Schema evolution: add / rename / drop / widen columns with field-id
preservation.

Reference surface: AddSchema + SetCurrentSchema commit updates
(iceberg-rust/src/catalog/commit.rs:65-75,303-317); multiple schemas coexist
in TableMetadata.schemas and each field carries a table-unique id
(iceberg-rust-spec/src/spec/schema.rs:20-32). The reference stores evolved
schemas but performs no column resolution; here old data files remain
readable across renames/widenings because the scan resolves columns by
FIELD ID across all historical schemas (see table/scan.py), the Spark-first
equivalent of Iceberg's parquet-field-id projection.

Allowed type promotions (Iceberg spec v2): int→long, float→double.
"""

from __future__ import annotations

from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

_PROMOTIONS = {("int", "long"), ("float", "double")}


class SchemaUpdate:
    """Fluent builder: ``table.update_schema().add_column("x", "long")
    .rename_column("a", "b").commit()`` → one AddSchema+SetCurrentSchema
    transaction."""

    def __init__(self, table):
        self._table = table
        self._fields: list[NestedField] = list(table.metadata.current_schema().fields)
        self._next_id = max(
            (f.field_id for s in table.metadata.schemas.values() for f in s.fields), default=0
        ) + 1

    def _idx(self, name: str) -> int:
        for i, f in enumerate(self._fields):
            if f.name == name:
                return i
        raise KeyError(f"no column named {name!r}")

    def add_column(self, name: str, field_type: str, doc: str | None = None) -> "SchemaUpdate":
        if any(f.name == name for f in self._fields):
            raise ValueError(f"column {name!r} already exists")
        # new columns are always optional: existing files have no values
        self._fields.append(NestedField(self._next_id, name, field_type, False, doc))
        self._next_id += 1
        return self

    def rename_column(self, old: str, new: str) -> "SchemaUpdate":
        if any(f.name == new for f in self._fields):
            raise ValueError(f"column {new!r} already exists")
        i = self._idx(old)
        f = self._fields[i]
        self._fields[i] = NestedField(f.field_id, new, f.field_type, f.required, f.doc)
        return self

    def drop_column(self, name: str) -> "SchemaUpdate":
        i = self._idx(name)
        part_source_ids = {pf.source_id for pf in self._table.metadata.default_spec().fields}
        if self._fields[i].field_id in part_source_ids:
            raise ValueError(f"cannot drop partition source column {name!r}")
        del self._fields[i]
        return self

    def widen_column(self, name: str, new_type: str) -> "SchemaUpdate":
        i = self._idx(name)
        f = self._fields[i]
        if (f.field_type, new_type) not in _PROMOTIONS:
            raise ValueError(f"type promotion {f.field_type} → {new_type} is not allowed")
        self._fields[i] = NestedField(f.field_id, name, new_type, f.required, f.doc)
        return self

    def commit(self):
        md = self._table.metadata
        new_id = max(md.schemas.keys(), default=0) + 1
        schema = Schema(schema_id=new_id, fields=tuple(self._fields))
        self._table.metadata = (
            self._table.new_transaction().add_schema(schema).set_current_schema(new_id).commit()
        )
        return self._table


def historical_names(metadata, field_id: int) -> list[tuple[str, object]]:
    """(name, type) variants a field id has carried, newest schema first —
    drives field-id column resolution in the scan."""
    out: list[tuple[str, object]] = []
    for s in sorted(metadata.schemas.values(), key=lambda s: -s.schema_id):
        for f in s.fields:
            if f.field_id == field_id and (f.name, f.field_type) not in out:
                out.append((f.name, f.field_type))
    return out
