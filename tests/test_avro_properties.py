"""Property-based tests (hypothesis) for the pure-Python Avro codec and
the Iceberg single-value serialization — the two byte-level codecs where a
fuzzer finds edge cases (negative varints, empty blocks, unicode, decimal
sign/scale) that example tests miss."""

import datetime as dt
import decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_rust_custom_spark.metadata.avro_codec import read_ocf, write_ocf
from iceberg_rust_custom_spark.metadata.iceberg_interop import (
    deserialize_single_value,
    serialize_single_value,
)

RECORD_SCHEMA = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": ["null", "string"], "default": None},
        {"name": "b", "type": "bytes"},
        {"name": "f", "type": "double"},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "kv", "type": {"type": "map", "values": "string"}},
    ],
}

records = st.fixed_dictionaries(
    {
        "i": st.integers(min_value=-(2**63), max_value=2**63 - 1),
        "s": st.none() | st.text(max_size=50),
        "b": st.binary(max_size=50),
        "f": st.floats(allow_nan=False),
        "arr": st.lists(st.integers(min_value=-(2**62), max_value=2**62), max_size=8),
        "kv": st.dictionaries(st.text(max_size=10), st.text(max_size=10), max_size=4),
    }
)


@settings(max_examples=60, deadline=None)
@given(recs=st.lists(records, max_size=12), codec=st.sampled_from(["null", "deflate"]))
def test_ocf_roundtrip_property(tmp_path_factory, recs, codec):
    path = str(tmp_path_factory.mktemp("avro") / "t.avro")
    write_ocf(path, RECORD_SCHEMA, recs, codec=codec)
    _, _, out = read_ocf(path)
    assert out == recs


@settings(max_examples=80, deadline=None)
@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_int_single_value_roundtrip(v):
    assert deserialize_single_value(serialize_single_value(v, "int"), "int") == v


@settings(max_examples=80, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_long_single_value_roundtrip(v):
    assert deserialize_single_value(serialize_single_value(v, "long"), "long") == v


@settings(max_examples=80, deadline=None)
@given(st.floats(allow_nan=False))
def test_double_single_value_roundtrip(v):
    assert deserialize_single_value(serialize_single_value(v, "double"), "double") == v


@settings(max_examples=80, deadline=None)
@given(st.text(max_size=200))
def test_string_single_value_roundtrip(v):
    assert deserialize_single_value(serialize_single_value(v, "string"), "string") == v


@settings(max_examples=80, deadline=None)
@given(
    st.integers(min_value=-(10**18), max_value=10**18),
    st.integers(min_value=0, max_value=8),
)
def test_decimal_single_value_roundtrip(unscaled, scale):
    t = f"decimal(20,{scale})"
    v = decimal.Decimal(unscaled).scaleb(-scale)
    assert deserialize_single_value(serialize_single_value(v, t), t) == v


@settings(max_examples=60, deadline=None)
@given(st.dates(min_value=dt.date(1, 1, 1), max_value=dt.date(9999, 12, 31)))
def test_date_single_value_roundtrip(v):
    assert deserialize_single_value(serialize_single_value(v, "date"), "date") == v


@settings(max_examples=60, deadline=None)
@given(
    st.datetimes(
        min_value=dt.datetime(1, 1, 1), max_value=dt.datetime(9999, 12, 31, 23, 59, 59)
    )
)
def test_timestamp_single_value_roundtrip(v):
    assert deserialize_single_value(serialize_single_value(v, "timestamp"), "timestamp") == v
