"""Minimal pure-Python Apache Avro codec (Object Container Files).

The Iceberg spec stores manifests and manifest lists as Avro OCF; the
reference writes them with the apache-avro Rust crate
(iceberg-rust/src/table/manifest.rs:107-392, manifest_list.rs:53-104). This
container has no Python Avro library, so this module implements the subset
of the public Avro 1.11 specification those files need:

* binary encoding: zigzag-varint ints/longs, length-prefixed bytes/strings,
  IEEE754-LE float/double, records, unions, arrays, maps, fixed, enums;
* Object Container File framing: magic ``Obj\\x01``, file-metadata map
  (``avro.schema``, ``avro.codec``), 16-byte sync marker, data blocks;
* codecs: ``null`` and ``deflate`` (raw zlib, no header — per spec).

Decoding is writer-schema-driven ("generic data"): records decode to dicts
keyed by field name, which makes reading files written by other engines
robust to field ordering and optional-field differences.

Implemented from the public Avro specification only.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

from iceberg_rust_custom_spark.io.fileio import FileIO

MAGIC = b"Obj\x01"


# ---------------------------------------------------------------------------
# binary primitives
# ---------------------------------------------------------------------------


def _write_long(out: io.BytesIO, n: int) -> None:
    # zigzag then varint
    n = (n << 1) ^ (n >> 63)
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.write(bytes((b | 0x80,)))
        else:
            out.write(bytes((b,)))
            return


def _read_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        byte = buf.read(1)
        if not byte:
            raise EOFError("unexpected end of Avro data")
        b = byte[0]
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_long(out, len(b))
    out.write(b)


def _read_bytes(buf: io.BytesIO) -> bytes:
    n = _read_long(buf)
    return _read_exact(buf, n)


def _read_exact(buf: io.BytesIO, n: int) -> bytes:
    """read(n) that raises on truncation — a corrupt/truncated Avro file
    must fail loudly, not yield short fixed values or a False boolean at
    EOF (ADVICE r2)."""
    b = buf.read(n)
    if len(b) != n:
        raise EOFError(f"short read: wanted {n} bytes, got {len(b)}")
    return b


# ---------------------------------------------------------------------------
# schema-driven datum encode / decode
# ---------------------------------------------------------------------------


def _type_name(schema) -> str:
    if isinstance(schema, str):
        return schema
    if isinstance(schema, list):
        return "union"
    return schema["type"]


def _union_branch_index(schema_list: list, datum) -> int:
    """Pick the union branch for a datum. Iceberg manifests only use
    ``["null", X]`` / ``[X, "null"]`` unions, so null-vs-not decides."""
    for i, s in enumerate(schema_list):
        if _type_name(s) == "null" and datum is None:
            return i
    for i, s in enumerate(schema_list):
        if _type_name(s) != "null":
            return i
    raise ValueError(f"no union branch for {datum!r} in {schema_list!r}")


def write_datum(out: io.BytesIO, schema, datum) -> None:
    t = _type_name(schema)
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if datum else b"\x00")
    elif t in ("int", "long"):
        _write_long(out, int(datum))
    elif t == "float":
        out.write(struct.pack("<f", float(datum)))
    elif t == "double":
        out.write(struct.pack("<d", float(datum)))
    elif t == "bytes":
        _write_bytes(out, bytes(datum))
    elif t == "string":
        _write_bytes(out, datum.encode("utf-8") if isinstance(datum, str) else bytes(datum))
    elif t == "fixed":
        b = bytes(datum)
        if len(b) != schema["size"]:
            raise ValueError(f"fixed size mismatch: {len(b)} != {schema['size']}")
        out.write(b)
    elif t == "enum":
        _write_long(out, schema["symbols"].index(datum))
    elif t == "union":
        idx = _union_branch_index(schema, datum)
        _write_long(out, idx)
        write_datum(out, schema[idx], datum)
    elif t == "array":
        items = list(datum or ())
        if items:
            _write_long(out, len(items))
            for it in items:
                write_datum(out, schema["items"], it)
        _write_long(out, 0)
    elif t == "map":
        entries = list((datum or {}).items())
        if entries:
            _write_long(out, len(entries))
            for k, v in entries:
                _write_bytes(out, k.encode("utf-8"))
                write_datum(out, schema["values"], v)
        _write_long(out, 0)
    elif t == "record":
        for f in schema["fields"]:
            name = f["name"]
            if isinstance(datum, dict):
                val = datum.get(name, f.get("default"))
            else:
                val = getattr(datum, name)
            write_datum(out, f["type"], val)
    else:
        raise ValueError(f"unsupported Avro type: {t!r}")


def read_datum(buf: io.BytesIO, schema, named: dict | None = None):
    if named is None:  # top-level call: index named types once
        named = {}
        _collect_named(schema, named)
    t = _type_name(schema)
    if isinstance(schema, str) and schema in named:
        schema = named[schema]
        t = _type_name(schema)
    if t == "null":
        return None
    if t == "boolean":
        return _read_exact(buf, 1) == b"\x01"
    if t in ("int", "long"):
        return _read_long(buf)
    if t == "float":
        return struct.unpack("<f", _read_exact(buf, 4))[0]
    if t == "double":
        return struct.unpack("<d", _read_exact(buf, 8))[0]
    if t == "bytes":
        return _read_bytes(buf)
    if t == "string":
        return _read_bytes(buf).decode("utf-8")
    if t == "fixed":
        return _read_exact(buf, schema["size"])
    if t == "enum":
        return schema["symbols"][_read_long(buf)]
    if t == "union":
        idx = _read_long(buf)
        return read_datum(buf, schema[idx], named)
    if t == "array":
        out = []
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:  # block with byte-size prefix
                n = -n
                _read_long(buf)
            for _ in range(n):
                out.append(read_datum(buf, schema["items"], named))
        return out
    if t == "map":
        out = {}
        while True:
            n = _read_long(buf)
            if n == 0:
                break
            if n < 0:
                n = -n
                _read_long(buf)
            for _ in range(n):
                k = _read_bytes(buf).decode("utf-8")
                out[k] = read_datum(buf, schema["values"], named)
        return out
    if t == "record":
        return {f["name"]: read_datum(buf, f["type"], named) for f in schema["fields"]}
    raise ValueError(f"unsupported Avro type: {t!r}")


def _collect_named(schema, named: dict) -> None:
    """Register named types (record/fixed/enum) so later references by name
    resolve — Avro schemas may reuse a named record type."""
    if isinstance(schema, list):
        for s in schema:
            _collect_named(s, named)
        return
    if not isinstance(schema, dict):
        return
    t = schema.get("type")
    if t in ("record", "fixed", "enum") and "name" in schema:
        named.setdefault(schema["name"], schema)
    if t == "record":
        for f in schema.get("fields", ()):
            _collect_named(f["type"], named)
    elif t == "array":
        _collect_named(schema["items"], named)
    elif t == "map":
        _collect_named(schema["values"], named)


# ---------------------------------------------------------------------------
# Object Container File
# ---------------------------------------------------------------------------


def write_ocf(
    path: str,
    schema: dict,
    records: list,
    metadata: dict[str, bytes] | None = None,
    codec: str = "deflate",
    sync: bytes = b"\x00" * 16,
) -> None:
    """Write an Avro Object Container File. ``metadata`` values are raw
    bytes (Iceberg stores JSON strings for schema / partition-spec keys)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported codec {codec!r}")
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    for k, v in (metadata or {}).items():
        meta[k] = v if isinstance(v, bytes) else str(v).encode()
    out = io.BytesIO()
    out.write(MAGIC)
    write_datum(out, {"type": "map", "values": "bytes"}, meta)
    out.write(sync)
    if records:
        block = io.BytesIO()
        for r in records:
            write_datum(block, schema, r)
        payload = block.getvalue()
        if codec == "deflate":
            # spec: raw DEFLATE stream, no zlib header/checksum
            payload = zlib.compress(payload)[2:-4]
        _write_long(out, len(records))
        _write_long(out, len(payload))
        out.write(payload)
        out.write(sync)
    FileIO.write_bytes(path, out.getvalue())


def read_ocf(path: str) -> tuple[dict, dict[str, bytes], list]:
    """Read an Avro OCF → (writer_schema, file_metadata, records)."""
    buf = io.BytesIO(FileIO.read_bytes(path))
    if buf.read(4) != MAGIC:
        raise ValueError(f"{path}: not an Avro object container file")
    meta = read_datum(buf, {"type": "map", "values": "bytes"})
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(16)
    records = []
    named: dict = {}
    _collect_named(schema, named)
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, 1)
        n = _read_long(buf)
        size = _read_long(buf)
        payload = buf.read(size)
        if codec == "deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != "null":
            raise ValueError(f"unsupported codec {codec!r}")
        block = io.BytesIO(payload)
        for _ in range(n):
            records.append(read_datum(block, schema, named))
        if buf.read(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return schema, meta, records
