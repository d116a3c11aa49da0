"""Roaring portable-format round-trip + structural invariants
(metadata/roaring.py). No third-party roaring build ships here, so the
format is pinned by exhaustive property tests: arbitrary 64-bit position
sets — sparse, dense ranges (run containers), >4096-per-chunk (bitmap
containers), multi-bucket — must round-trip exactly, and the emitted
cookies/container choices must match the spec's rules."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_rust_custom_spark.metadata.roaring import (
    ARRAY_MAX,
    SERIAL_COOKIE,
    SERIAL_COOKIE_NO_RUN,
    deserialize32,
    deserialize64,
    serialize32,
    serialize64,
)


def _rt32(vals):
    vals = np.unique(np.asarray(vals, dtype=np.uint32))
    buf = serialize32(vals)
    got, used = deserialize32(buf)
    assert used == len(buf)
    assert np.array_equal(got, vals)
    return buf


def test_array_container():
    buf = _rt32([1, 5, 7, 65535, 65536, 70000])
    assert int.from_bytes(buf[:4], "little") == SERIAL_COOKIE_NO_RUN


def test_empty():
    assert len(deserialize64(serialize64([]))) == 0
    got, _ = deserialize32(serialize32(np.array([], dtype=np.uint32)))
    assert len(got) == 0


def test_run_container_chosen_for_dense_range():
    buf = _rt32(np.arange(1000, 9000))  # one run beats array and bitmap
    assert int.from_bytes(buf[:4], "little") & 0xFFFF == SERIAL_COOKIE
    assert len(buf) < 100  # 2 cookie+flags+header + one run


def test_bitmap_container_chosen_above_array_max():
    rng = np.random.default_rng(7)
    vals = rng.choice(65536, size=ARRAY_MAX + 500, replace=False).astype(np.uint32)
    buf = _rt32(vals)
    # spread-out values: runs don't pay, bitmap does (8 KiB + headers)
    assert 8192 <= len(buf) <= 8192 + 64


def test_multibucket_64():
    vals = [0, 1, 2**32 - 1, 2**32, 2**32 + 5, 2**40, 2**40 + 1]
    got = deserialize64(serialize64(vals))
    assert list(got) == sorted(set(vals))


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**40),
        min_size=0,
        max_size=300,
    )
)
def test_roundtrip_sparse_property(vals):
    got = deserialize64(serialize64(vals))
    assert sorted(set(vals)) == [int(v) for v in got]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**20), st.integers(1, 9000)),
        min_size=1,
        max_size=4,
    )
)
def test_roundtrip_dense_ranges_property(ranges):
    """Dense ranges force run/bitmap containers and multi-container splits."""
    vals = np.unique(
        np.concatenate([np.arange(s, s + n, dtype=np.uint64) for s, n in ranges])
    )
    got = deserialize64(serialize64(vals))
    assert np.array_equal(got, vals)


def test_mixed_container_types_one_stream():
    """Array + run + bitmap containers coexisting in one 32-bit bitmap."""
    rng = np.random.default_rng(11)
    arr_part = rng.choice(65536, size=100, replace=False).astype(np.uint32)  # key 0: array
    run_part = np.arange(5000, dtype=np.uint32) + (1 << 16)  # key 1: run
    bmp_part = (
        rng.choice(65536, size=ARRAY_MAX + 200, replace=False).astype(np.uint32) + (2 << 16)
    )  # key 2: bitmap
    vals = np.unique(np.concatenate([arr_part, run_part, bmp_part]))
    buf = serialize32(vals)
    got, used = deserialize32(buf)
    assert used == len(buf) and np.array_equal(got, vals)
