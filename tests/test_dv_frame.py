"""Deletion-vector blob framing — pinned to the published Iceberg v3
``deletion-vector-v1`` layout so external v3 readers accept the blobs:

    [4-byte big-endian length of magic+vector]
    [magic D1 D3 39 64]
    [64-bit roaring portable vector]
    [4-byte big-endian CRC-32 of magic+vector]

Golden bytes are committed as fixtures (tests/fixtures/) so any framing
regression is a byte-diff, not a behavior hunt — no JVM Iceberg ships in
this environment, so the fixtures ARE the interop pin."""

import pathlib
import zlib

import numpy as np
import pytest

from iceberg_rust_custom_spark.metadata.roaring import serialize64
from iceberg_rust_custom_spark.table.deletion_vectors import (
    DV_MAGIC,
    dv_frame,
    parse_dv_frame,
)

FIXTURES = pathlib.Path(__file__).parent / "fixtures"
# spans three roaring buckets: low array, one mid value, a >2^32 position
GOLDEN_POSITIONS = np.array(
    [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 1000, 196613, 2**33 + 7], dtype=np.uint64
)


def test_frame_layout_is_spec_v3():
    vec = serialize64(GOLDEN_POSITIONS)
    f = dv_frame(GOLDEN_POSITIONS)
    n = int.from_bytes(f[:4], "big")
    assert n == 4 + len(vec)  # length prefix covers magic+vector, not CRC
    assert f[4:8] == DV_MAGIC == bytes.fromhex("d1d33964")
    assert f[8 : 8 + len(vec)] == vec
    crc = int.from_bytes(f[8 + len(vec) : 12 + len(vec)], "big")
    assert crc == zlib.crc32(DV_MAGIC + vec)
    assert len(f) == 4 + 4 + len(vec) + 4


def test_golden_fixture_bytes_pinned():
    assert dv_frame(GOLDEN_POSITIONS) == (FIXTURES / "dv_frame_v3.bin").read_bytes()
    assert serialize64(GOLDEN_POSITIONS) == (FIXTURES / "roaring64_portable.bin").read_bytes()


def test_parse_roundtrip_and_golden():
    got = parse_dv_frame((FIXTURES / "dv_frame_v3.bin").read_bytes())
    assert (got == GOLDEN_POSITIONS).all()


def test_parse_accepts_legacy_r5_frame():
    """Tables written before the spec alignment framed as
    [magic][vector][CRC LE]; reads must keep working."""
    vec = serialize64(GOLDEN_POSITIONS)
    body = DV_MAGIC + vec
    legacy = body + zlib.crc32(body).to_bytes(4, "little")
    assert (parse_dv_frame(legacy) == GOLDEN_POSITIONS).all()


def test_parse_rejects_corruption():
    f = bytearray(dv_frame(GOLDEN_POSITIONS))
    f[10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        parse_dv_frame(bytes(f))
    with pytest.raises(ValueError, match="magic|truncated"):
        parse_dv_frame(b"\x00\x00\x00\x08XXXXyyyy\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="truncated"):
        parse_dv_frame(dv_frame(GOLDEN_POSITIONS)[:10])
