"""Iceberg v3 VARIANT columns.

Logical type: Spark 4 VariantType (typed access via variant_get; built by
parse_json). Physical storage: JSON text (Schema.physical_spark_schema) —
Spark's parquet VARIANT logical type is unreadable by the engine's pyarrow
footer-stats collector, so the write/read boundary converts with
to_json / parse_json. The reference has no v3 type support
(iceberg-rust-spec/src/spec/types.rs:185-344 stops at the v2 primitives).
"""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.table.maintenance import compact, delete_where

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def _vdf(spark):
    return spark.range(4).select(
        F.col("id"),
        F.parse_json(
            F.concat(
                F.lit('{"a":'),
                F.col("id").cast("string"),
                F.lit(',"tag":"t'),
                (F.col("id") % 2).cast("string"),
                F.lit('"}'),
            )
        ).alias("v"),
    )


def _mk(eng, spark, name):
    eng.sql(f"CREATE TABLE {name} (id BIGINT, v VARIANT) STORED AS ICEBERG")
    t = eng.load_table(name)
    t.append(_vdf(spark))
    return t


def test_variant_roundtrip_and_typed_extract(eng, spark):
    t = _mk(eng, spark, "ns.v1")
    df = t.scan()
    assert isinstance(df.schema["v"].dataType, T.VariantType)
    rows = {
        (r.id, r.a, r.tag)
        for r in df.select(
            "id",
            F.variant_get("v", "$.a", "long").alias("a"),
            F.variant_get("v", "$.tag", "string").alias("tag"),
        ).collect()
    }
    assert rows == {(0, 0, "t0"), (1, 1, "t1"), (2, 2, "t0"), (3, 3, "t1")}


def test_json_text_insert_fills_variant(eng, spark):
    """A writer may hand JSON text straight into a variant column — it IS
    the physical form; parsing happens at read."""
    eng.sql("CREATE TABLE ns.v2 (id BIGINT, v VARIANT) STORED AS ICEBERG")
    t = eng.load_table("ns.v2")
    t.append(spark.createDataFrame([(1, '{"x": 10}'), (2, None)], "id long, v string"))
    rows = {
        (r.id, r.x)
        for r in t.scan().select("id", F.variant_get("v", "$.x", "long").alias("x")).collect()
    }
    assert rows == {(1, 10), (2, None)}


def test_variant_mor_delete_and_compact_with_lineage(eng, spark):
    t = _mk(eng, spark, "ns.v3")
    before = {
        (r.id, r._row_id) for r in t.scan(row_lineage=True).select("id", "_row_id").collect()
    }
    delete_where(t, "id = 1", mode="merge-on-read")
    t = eng.load_table("ns.v3")
    compact(t)  # materializes the delete AND explicit lineage, re-encoding variant
    t = eng.load_table("ns.v3")
    rows = {
        (r.id, r._row_id, r.a)
        for r in t.scan(row_lineage=True)
        .select("id", "_row_id", F.variant_get("v", "$.a", "long").alias("a"))
        .collect()
    }
    assert {(r[0], r[1]) for r in rows} == {p for p in before if p[0] != 1}
    assert all(r[0] == r[2] for r in rows)  # variant payload survived the rewrite


def test_variant_cow_update(eng, spark):
    from iceberg_rust_custom_spark.table.maintenance import update_where

    t = _mk(eng, spark, "ns.v4")
    update_where(t, {"v": "parse_json('{\"a\": 99}')"}, "id = 2", mode="copy-on-write")
    t = eng.load_table("ns.v4")
    by_id = {
        r.id: r.a
        for r in t.scan().select("id", F.variant_get("v", "$.a", "long").alias("a")).collect()
    }
    assert by_id == {0: 0, 1: 1, 2: 99, 3: 3}


def test_variant_added_by_schema_evolution(eng, spark):
    eng.sql("CREATE TABLE ns.v5 (id BIGINT) STORED AS ICEBERG")
    t = eng.load_table("ns.v5")
    t.append(spark.range(2).select("id"))
    t.update_schema().add_column("v", "variant").commit()
    t.append(spark.range(2, 4).select("id", F.parse_json(F.lit('{"n":1}')).alias("v")))
    rows = {
        (r.id, r.n)
        for r in t.scan().select("id", F.variant_get("v", "$.n", "int").alias("n")).collect()
    }
    assert rows == {(0, None), (1, None), (2, 1), (3, 1)}
    # rename keeps values via field-id resolution
    t.update_schema().rename_column("v", "payload").commit()
    t2 = eng.load_table("ns.v5")
    got = {
        (r.id, r.n)
        for r in t2.scan()
        .select("id", F.variant_get("payload", "$.n", "int").alias("n"))
        .collect()
    }
    assert got == rows


def test_variant_ddl_alter_add_and_ctas(eng, spark):
    eng.sql("CREATE TABLE ns.v6 (id BIGINT) STORED AS ICEBERG")
    eng.sql("ALTER TABLE ns.v6 ADD COLUMN v VARIANT")
    t = eng.load_table("ns.v6")
    assert t.metadata.current_schema().field_by_name("v").field_type == "variant"
    t.append(_vdf(spark).limit(2))
    assert t.scan().count() == 2
    # CTAS carries the variant type through spark_type_to_iceberg
    eng.sql("CREATE TABLE ns.v7 STORED AS ICEBERG AS SELECT * FROM ns.v6")
    t7 = eng.load_table("ns.v7")
    assert t7.metadata.current_schema().field_by_name("v").field_type == "variant"
    assert t7.scan().count() == 2


def test_variant_pushdown_on_sibling_columns_survives(eng, spark):
    t = _mk(eng, spark, "ns.v8")
    files_all = t.count_planned_files()
    files_pruned = t.count_planned_files("id > 100")
    assert files_pruned == 0 and files_all >= 1  # id bounds intact next to variant
