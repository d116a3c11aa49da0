"""Metadata-kernel unit tests (SURVEY.md §5: spec serde + transform vectors).

Golden/invalid fixtures mirror the reference's table-metadata test strategy
(iceberg-rust-spec/testdata/table_metadata/*.json)."""

import datetime as dt

import pytest

from iceberg_rust_custom_spark.metadata.expressions import (
    Comparison,
    FileBounds,
    may_match,
    parse_predicate,
    project_to_partition,
)
from iceberg_rust_custom_spark.metadata.partition import PartitionSpec
from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
from iceberg_rust_custom_spark.metadata.sort import SortOrder
from iceberg_rust_custom_spark.metadata.table_metadata import TableMetadata
from iceberg_rust_custom_spark.metadata.transforms import Transform, bucket_python, murmur3_32

ORDERS = Schema(
    0,
    (
        NestedField(1, "id", "long", True),
        NestedField(2, "customer_id", "long", True),
        NestedField(3, "product_id", "long", True),
        NestedField(4, "date", "date", True),
        NestedField(5, "amount", "int", True),
    ),
)


def test_metadata_roundtrip():
    spec = PartitionSpec.build(ORDERS, ("date", "day"))
    md = TableMetadata.new("/tmp/wh/orders", ORDERS, spec)
    md2 = TableMetadata.from_json(md.to_json())
    assert md2.current_schema() == ORDERS
    assert md2.default_spec() == spec
    assert md2.table_uuid == md.table_uuid
    assert md2.properties["write.parquet.compression-codec"] == "zstd"


def test_metadata_invalid_fixtures():
    md = TableMetadata.new("/tmp/wh/t", ORDERS)
    d = md.to_dict()
    bad = dict(d, **{"format-version": 4})  # v3 accepted since r11
    with pytest.raises(ValueError, match="unsupported format version"):
        TableMetadata.from_dict(bad)
    bad = dict(d, **{"current-schema-id": 99})
    with pytest.raises(ValueError, match="current-schema-id"):
        TableMetadata.from_dict(bad)


def test_schema_spark_roundtrip():
    st = ORDERS.spark_schema()
    assert [f.name for f in st.fields] == ["id", "customer_id", "product_id", "date", "amount"]
    back = Schema.from_spark(st)
    assert [f.field_type for f in back.fields] == ["long", "long", "long", "date", "int"]
    assert [f.field_id for f in back.fields] == [1, 2, 3, 4, 5]


def test_murmur3_iceberg_vectors():
    """Iceberg spec Appendix B hash vectors (public spec)."""

    def signed(u):
        return u - (1 << 32) if u >= (1 << 31) else u

    import struct

    assert signed(murmur3_32(struct.pack("<q", 34))) == 2017239379  # int/long 34
    assert signed(murmur3_32(b"iceberg")) == 1210000089  # string
    days = (dt.date(2017, 11, 16) - dt.date(1970, 1, 1)).days
    assert signed(murmur3_32(struct.pack("<q", days))) == -653330422  # date


def test_transform_values():
    assert Transform("year").python(dt.date(2023, 5, 1)) == 53
    assert Transform("month").python(dt.date(2023, 5, 1)) == 53 * 12 + 4
    assert Transform("day").python(dt.date(2023, 5, 1)) == 19478
    assert Transform("hour").python(dt.datetime(2023, 5, 1, 10, 30)) == 19478 * 24 + 10
    assert Transform("truncate[10]").python(17) == 10
    assert Transform("truncate[10]").python(-7) == -10  # rem_euclid
    assert Transform("truncate[3]").python("iceberg") == "ice"
    assert Transform("void").python(123) is None
    assert bucket_python(34, 16) == (2017239379 & 0x7FFFFFFF) % 16


def test_predicate_parse_and_bounds():
    e = parse_predicate("l_shipdate >= '1996-01-01' AND l_quantity < 25")
    schema = Schema(
        0, (NestedField(1, "l_shipdate", "date", True), NestedField(2, "l_quantity", "double", True))
    )
    fb = FileBounds(
        {"l_shipdate": "1995-01-01", "l_quantity": 30.0},
        {"l_shipdate": "1995-12-31", "l_quantity": 50.0},
        {},
        {},
        schema,
    )
    assert not may_match(e, fb)  # date range entirely before 1996
    fb2 = FileBounds(
        {"l_shipdate": "1995-06-01", "l_quantity": 1.0},
        {"l_shipdate": "1996-06-30", "l_quantity": 50.0},
        {},
        {},
        schema,
    )
    assert may_match(e, fb2)


def test_partition_projection():
    schema = Schema(0, (NestedField(1, "ship", "date", True), NestedField(2, "pk", "long", True)))
    spec = PartitionSpec.build(schema, ("ship", "month"), ("pk", "bucket[16]"))
    e = parse_predicate("ship >= '1996-02-15' AND pk = 34")
    p = project_to_partition(e, schema, spec)
    # month(1996-02-15) = 26*12+1 = 313; bucket16(34) from the spec vector
    txt = p.sql()
    assert "ship_month >= 313" in txt
    assert f"pk_bucket = {(2017239379 & 0x7FFFFFFF) % 16}" in txt


def test_sort_order_serde():
    so = SortOrder.from_dict(
        {
            "order-id": 1,
            "fields": [
                {"source-id": 4, "transform": "identity", "direction": "asc", "null-order": "nulls-first"}
            ],
        }
    )
    assert so.to_dict()["fields"][0]["source-id"] == 4


@pytest.mark.slow
def test_murmur3_string_expression_bit_exact(spark):
    """The pure-expression murmur3_x86_32 over strings equals the Python
    reference byte-for-byte on ASCII/unicode/emoji/empty inputs (kept as
    the UDF-free alternative; the write path stays on the Arrow UDF —
    measured ~10x faster)."""
    import random
    import string as _string

    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.metadata.transforms import (
        murmur3_32,
        murmur3_32_string_expr,
    )

    random.seed(11)
    vals = ["", "a", "ab", "abc", "abcd", "abcde", "iceberg", "héllo wörld",
            "日本語テキスト", "x" * 100, None, "emoji 🎉🎊"]
    vals += ["".join(random.choices(_string.printable, k=random.randint(0, 40)))
             for _ in range(60)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    for r in df.select("s", murmur3_32_string_expr(F.col("s")).alias("h")).collect():
        exp = None if r.s is None else murmur3_32(r.s.encode("utf-8"))
        assert r.h == exp, (r.s, r.h, exp)
