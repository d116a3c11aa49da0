"""Schema evolution: add / rename / drop / widen columns with field-id
preservation — top-level AND nested (dotted paths into structs).

Reference surface: AddSchema + SetCurrentSchema commit updates
(iceberg-rust/src/catalog/commit.rs:65-75,303-317); multiple schemas coexist
in TableMetadata.schemas and each field carries a table-unique id —
including fields INSIDE structs (iceberg-rust-spec/src/spec/schema.rs:20-32;
the nested field-id model is types.rs:185-344). The reference stores evolved
schemas but performs no column resolution; here old data files remain
readable across renames/widenings because the scan resolves columns by
FIELD ID across all historical schemas (see table/scan.py), recursively for
struct members — the Spark-first equivalent of Iceberg's parquet-field-id
projection.

Dotted paths address struct members at any depth: ``add_column("a.b.c",
"long")`` adds field ``c`` (fresh table-unique id) to the struct at ``a.b``;
rename/drop/widen take the same paths. Paths traverse structs only — list
elements and map values are single anonymous slots in this model (no
element/key/value ids), so they evolve by replacing the whole column.

Allowed type promotions (Iceberg spec v2): int→long, float→double.
"""

from __future__ import annotations

import dataclasses as _dc

from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

_PROMOTIONS = {("int", "long"), ("float", "double")}

_DECIMAL_RE = __import__("re").compile(r"decimal\((\d+),\s*(\d+)\)")


def _promotion_allowed(old: str, new: str) -> bool:
    """Spec type promotions. v2: int→long, float→double. v3 additions:
    date→timestamp, decimal(P,S)→decimal(P',S) with P' ≥ P (same scale),
    and unknown→any (an unknown column carries no values to reinterpret).
    The reference's v2-only model stops at the first two
    (iceberg-rust-spec/src/spec/types.rs:185-344)."""
    if (old, new) in _PROMOTIONS:
        return True
    if old == "unknown":
        return True
    if old == "date" and new in ("timestamp", "timestamptz", "timestamp_ns", "timestamptz_ns"):
        return True
    mo, mn = _DECIMAL_RE.fullmatch(old or ""), _DECIMAL_RE.fullmatch(new or "")
    if mo and mn:
        return int(mn.group(2)) == int(mo.group(2)) and int(mn.group(1)) >= int(mo.group(1))
    return False


def walk_field_ids(field_type) -> list[int]:
    """Every field id carried INSIDE a type (struct members, recursively).
    Primitive / list / map types contribute none of their own — this model
    gives list elements and map entries no ids (see module docstring)."""
    out: list[int] = []
    if isinstance(field_type, dict):
        kind = field_type.get("type")
        if kind == "struct":
            for f in field_type["fields"]:
                out.append(f["id"])
                out.extend(walk_field_ids(f["type"]))
        elif kind == "list":
            out.extend(walk_field_ids(field_type["element"]))
        elif kind == "map":
            out.extend(walk_field_ids(field_type["key"]))
            out.extend(walk_field_ids(field_type["value"]))
    return out


def _edit_struct(field_type, parts: list[str], op):
    """Rebuild a (possibly nested) struct type dict with ``op(fields,
    leaf_name) -> new_fields`` applied at the struct addressed by
    ``parts[:-1]``; ``parts[-1]`` is the leaf passed to ``op``."""
    if not (isinstance(field_type, dict) and field_type.get("type") == "struct"):
        raise ValueError("path traverses a non-struct type")
    fields = [dict(f) for f in field_type["fields"]]
    if len(parts) == 1:
        fields = op(fields, parts[0])
    else:
        for i, f in enumerate(fields):
            if f["name"] == parts[0]:
                fields[i] = {**f, "type": _edit_struct(f["type"], parts[1:], op)}
                break
        else:
            raise KeyError(f"no struct field named {parts[0]!r}")
    return {**field_type, "fields": fields}


class SchemaUpdate:
    """Fluent builder: ``table.update_schema().add_column("x", "long")
    .rename_column("a", "b").commit()`` → one AddSchema+SetCurrentSchema
    transaction."""

    def __init__(self, table):
        self._table = table
        self._fields: list[NestedField] = list(table.metadata.current_schema().fields)
        all_ids = [
            fid
            for s in table.metadata.schemas.values()
            for f in s.fields
            for fid in (f.field_id, *walk_field_ids(f.field_type))
        ]
        self._next_id = max(all_ids, default=0) + 1

    def _idx(self, name: str) -> int:
        for i, f in enumerate(self._fields):
            if f.name == name:
                return i
        raise KeyError(f"no column named {name!r}")

    def _nested(self, path: str, op) -> None:
        """Apply ``op`` inside the struct column addressed by the dotted
        ``path``'s head, replacing the top-level field immutably."""
        top, *rest = path.split(".")
        i = self._idx(top)
        f = self._fields[i]
        self._fields[i] = _dc.replace(f, field_type=_edit_struct(f.field_type, rest, op))

    def add_column(
        self, name: str, field_type, doc: str | None = None, default=None
    ) -> "SchemaUpdate":
        """``default`` (Iceberg v3): sets BOTH initial-default (what rows
        written before the field existed read back as — fixed here, never
        mutated later, per spec) and write-default (what a writer omitting
        the column fills in)."""
        if "." in name:
            def op(fields, leaf):
                if any(x["name"] == leaf for x in fields):
                    raise ValueError(f"column {name!r} already exists")
                d = {"id": self._next_id, "name": leaf, "type": field_type, "required": False}
                if doc:
                    d["doc"] = doc
                if default is not None:
                    d["initial-default"] = default
                    d["write-default"] = default
                return [*fields, d]

            self._nested(name, op)
            self._next_id += 1
            return self
        if any(f.name == name for f in self._fields):
            raise ValueError(f"column {name!r} already exists")
        # new columns are always optional: existing files have no values
        self._fields.append(
            NestedField(self._next_id, name, field_type, False, doc, default, default)
        )
        self._next_id += 1
        return self

    def rename_column(self, old: str, new: str) -> "SchemaUpdate":
        if "." in old:  # ``new`` is the bare leaf name
            def op(fields, leaf):
                if any(x["name"] == new for x in fields):
                    raise ValueError(f"column {new!r} already exists")
                out = []
                for x in fields:
                    out.append({**x, "name": new} if x["name"] == leaf else x)
                if out == fields:
                    raise KeyError(f"no column named {old!r}")
                return out

            self._nested(old, op)
            return self
        if any(f.name == new for f in self._fields):
            raise ValueError(f"column {new!r} already exists")
        i = self._idx(old)
        f = self._fields[i]
        self._fields[i] = _dc.replace(f, name=new)
        return self

    def drop_column(self, name: str) -> "SchemaUpdate":
        if "." in name:
            def op(fields, leaf):
                out = [x for x in fields if x["name"] != leaf]
                if len(out) == len(fields):
                    raise KeyError(f"no column named {name!r}")
                if not out:
                    raise ValueError(f"cannot drop the last field of struct {name!r}")
                return out

            self._nested(name, op)
            return self
        i = self._idx(name)
        part_source_ids = {pf.source_id for pf in self._table.metadata.default_spec().fields}
        if self._fields[i].field_id in part_source_ids:
            raise ValueError(f"cannot drop partition source column {name!r}")
        del self._fields[i]
        return self

    def widen_column(self, name: str, new_type: str) -> "SchemaUpdate":
        if "." in name:
            def op(fields, leaf):
                out = []
                for x in fields:
                    if x["name"] == leaf:
                        if not _promotion_allowed(x["type"], new_type):
                            raise ValueError(
                                f"type promotion {x['type']} → {new_type} is not allowed"
                            )
                        out.append({**x, "type": new_type})
                    else:
                        out.append(x)
                if out == fields:
                    raise KeyError(f"no column named {name!r}")
                return out

            self._nested(name, op)
            return self
        i = self._idx(name)
        f = self._fields[i]
        if not _promotion_allowed(f.field_type, new_type):
            raise ValueError(f"type promotion {f.field_type} → {new_type} is not allowed")
        self._fields[i] = _dc.replace(f, field_type=new_type)
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
