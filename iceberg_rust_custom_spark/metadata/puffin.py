"""Puffin file format — the Iceberg spec's container for statistics blobs.

Spec (public: iceberg.apache.org/puffin-spec): a Puffin file is

    Magic, Blob₁ … Blobₙ, Footer

    Footer = Magic, FooterPayload (UTF-8 JSON FileMetadata, optionally
             LZ4-compressed), FooterPayloadSize (4-byte LE int),
             Flags (4 bytes; bit 0 of byte 0 = footer-compressed),
             Magic

    Magic = 0x50 0x46 0x41 0x31  ("PFA1")

FileMetadata JSON: {"blobs": [BlobMetadata…], "properties": {…}} where
BlobMetadata = {"type", "fields" (column ids), "snapshot-id",
"sequence-number", "offset", "length", "compression-codec"?,
"properties"?}.

This engine stores its per-column NDV sketches (Spark's
``hll_sketch_agg`` binaries — Apache DataSketches HllSketch, readable by
any DataSketches build) as blobs of type
``apache-datasketches-hll-v1`` (the spec standardizes the *theta* sketch
type; HLL rides the same container with an explicit type tag, which the
spec permits — readers skip unknown types by contract). Blobs are written
uncompressed; the footer is written uncompressed (flags = 0) so any
reader without an LZ4 dependency can parse it.

Reference parity: the reference repo has no statistics support at all
(this whole plane is beyond-reference); the FORMAT is implemented
from the public spec so the files interoperate with engines that do.
"""

from __future__ import annotations

import json

from iceberg_rust_custom_spark.io.fileio import FileIO

MAGIC = b"PFA1"
HLL_BLOB_TYPE = "apache-datasketches-hll-v1"


def write_puffin(
    path: str,
    blobs: list[dict],
    file_properties: dict | None = None,
) -> dict:
    """Write a spec-correct Puffin file.

    ``blobs``: [{"type", "fields", "snapshot-id", "sequence-number",
    "data": bytes, "properties"?}, …]. Returns the FileMetadata dict as
    written (with computed offsets/lengths)."""
    out = bytearray()
    out += MAGIC
    metas = []
    for b in blobs:
        data = b["data"]
        metas.append(
            {
                "type": b["type"],
                "fields": list(b.get("fields", [])),
                "snapshot-id": b["snapshot-id"],
                "sequence-number": b["sequence-number"],
                "offset": len(out),
                "length": len(data),
                **({"properties": b["properties"]} if b.get("properties") else {}),
            }
        )
        out += data
    file_meta = {"blobs": metas, "properties": dict(file_properties or {})}
    payload = json.dumps(file_meta).encode("utf-8")
    out += MAGIC  # footer opening magic
    out += payload
    out += len(payload).to_bytes(4, "little")
    out += (0).to_bytes(4, "little")  # flags: footer uncompressed
    out += MAGIC
    FileIO.write_bytes(path, bytes(out))
    return file_meta


def read_puffin(path: str) -> tuple[dict, list[bytes]]:
    """Read a Puffin file → (FileMetadata dict, [blob bytes] in blob
    order). Validates magics; rejects compressed footers (this writer
    never produces them, and external files with LZ4 footers need an LZ4
    codec this environment doesn't ship)."""
    raw = FileIO.read_bytes(path)
    if raw[:4] != MAGIC or raw[-4:] != MAGIC:
        raise ValueError(f"not a Puffin file (bad magic): {path}")
    flags = int.from_bytes(raw[-8:-4], "little")
    if flags & 0x1:
        raise ValueError("compressed Puffin footer not supported (no LZ4 codec)")
    payload_size = int.from_bytes(raw[-12:-8], "little")
    payload = raw[-12 - payload_size : -12]
    footer_magic = raw[-12 - payload_size - 4 : -12 - payload_size]
    if footer_magic != MAGIC:
        raise ValueError(f"corrupt Puffin footer (bad opening magic): {path}")
    meta = json.loads(payload.decode("utf-8"))
    out = []
    for b in meta.get("blobs", []):
        off, n = b["offset"], b["length"]
        if b.get("compression-codec"):
            raise ValueError(f"unsupported blob compression: {b['compression-codec']}")
        out.append(bytes(raw[off : off + n]))
    return meta, out
