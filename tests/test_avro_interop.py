"""Spec-compliant Avro metadata interop (metadata/avro_codec.py +
metadata/iceberg_interop.py).

The reference's interop evidence is the Trino round-trip
(datafusion_iceberg/tests/integration_trino.rs:70-467); offline we verify
(a) our Avro OCF codec against the *independent JVM Avro implementation*
shipped in Spark's jars, and (b) a full export→import round-trip that
preserves rows, stats-based pruning, and bounds values.
"""

import datetime as dt
import decimal
import glob
import os

import pytest

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.metadata.avro_codec import read_ocf, write_ocf
from iceberg_rust_custom_spark.metadata.iceberg_interop import (
    deserialize_single_value,
    export_snapshot,
    import_iceberg_table,
    serialize_single_value,
)


def test_single_value_serialization_roundtrip():
    cases = [
        (True, "boolean"),
        (False, "boolean"),
        (-123, "int"),
        (2**40, "long"),
        (1.5, "float"),
        (-2.25, "double"),
        (dt.date(2023, 6, 15), "date"),
        (dt.datetime(2023, 6, 15, 12, 30, 45, 123456), "timestamp"),
        ("héllo", "string"),
        (b"\x00\x01\xff", "binary"),
        (decimal.Decimal("123.4500"), "decimal(10,4)"),
        (decimal.Decimal("-0.0001"), "decimal(10,4)"),
    ]
    for v, t in cases:
        assert deserialize_single_value(serialize_single_value(v, t), t) == v, (v, t)


def test_single_value_spec_encodings():
    # spec: little-endian numerics, UTF-8 strings, big-endian unscaled decimal
    assert serialize_single_value(1, "int") == b"\x01\x00\x00\x00"
    assert serialize_single_value(dt.date(1970, 1, 2), "date") == b"\x01\x00\x00\x00"
    assert serialize_single_value("ab", "string") == b"ab"
    assert serialize_single_value(decimal.Decimal("1.00"), "decimal(9,2)") == b"\x64"
    assert (
        serialize_single_value(dt.datetime(1970, 1, 1, 0, 0, 1), "timestamp")
        == (10**6).to_bytes(8, "little")
    )


def test_ocf_roundtrip_and_jvm_cross_read(spark, tmp_path):
    schema = {
        "type": "record",
        "name": "rec",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": ["null", "string"], "default": None},
            {"name": "tags", "type": {"type": "array", "items": "string"}},
            {"name": "kv", "type": {"type": "map", "values": "long"}},
            {"name": "blob", "type": "bytes"},
        ],
    }
    recs = [
        {"id": 1, "name": "a", "tags": ["x", "y"], "kv": {"k": 2}, "blob": b"\x00\x01"},
        {"id": -7, "name": None, "tags": [], "kv": {}, "blob": b""},
    ]
    for codec in ("null", "deflate"):
        p = str(tmp_path / f"t_{codec}.avro")
        write_ocf(p, schema, recs, metadata={"k1": "v1"}, codec=codec)
        s, meta, out = read_ocf(p)
        assert out == recs
        assert meta["k1"] == b"v1"
        # independent implementation: JVM Avro (avro-1.x jar in Spark)
        jvm = spark._jvm
        rdr = jvm.org.apache.avro.file.DataFileReader(
            jvm.java.io.File(p), jvm.org.apache.avro.generic.GenericDatumReader()
        )
        rows = []
        while rdr.hasNext():
            rows.append(rdr.next())
        assert len(rows) == 2
        assert rows[0].get("id") == 1 and str(rows[0].get("name")) == "a"
        assert rows[1].get("id") == -7 and rows[1].get("name") is None


@pytest.fixture()
def exported_table(spark, tmp_path, sf_dir):
    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    eng.sql(
        "CREATE TABLE ns.orders (o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING, "
        "o_totalprice DOUBLE, o_orderdate TIMESTAMP) STORED AS ICEBERG "
        "PARTITIONED BY (month(o_orderdate))"
    )
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    eng.insert("ns.orders", src)
    md_path = eng.export_table("ns.orders", str(tmp_path / "exported"))
    return eng, md_path


def test_export_is_jvm_readable_spec_v2(spark, exported_table, tmp_path):
    _, md_path = exported_table
    exp_dir = os.path.dirname(os.path.dirname(md_path))
    jvm = spark._jvm
    (ml,) = glob.glob(exp_dir + "/metadata/snap-*.avro")
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(ml), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    ml_rows = []
    while rdr.hasNext():
        ml_rows.append(rdr.next())
    assert ml_rows, "empty manifest list"
    for r in ml_rows:
        assert os.path.exists(str(r.get("manifest_path")))
        assert r.get("added_files_count") >= 0
    # manifest entries decode with the independent reader, carry bounds
    mf = str(ml_rows[0].get("manifest_path"))
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(mf), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    n = 0
    while rdr.hasNext():
        e = rdr.next()
        d = e.get("data_file")
        assert str(d.get("file_format")) == "PARQUET"
        assert d.get("record_count") > 0
        assert d.get("lower_bounds") is not None
        n += 1
    assert n > 0
    # file metadata keys per manifest.rs:125-170
    from iceberg_rust_custom_spark.metadata.avro_codec import read_ocf as _read

    _, meta, _ = _read(mf)
    for k in ("schema", "partition-spec", "partition-spec-id", "format-version", "content"):
        assert k in meta, k


def test_import_roundtrip_preserves_rows_and_pruning(spark, exported_table, tmp_path):
    eng, md_path = exported_table
    t2 = eng.import_table("ns.orders_imported", md_path)
    orig = eng.load_table("ns.orders")
    assert t2.scan().count() == orig.scan().count()
    pred = "o_orderdate >= TIMESTAMP '1997-06-01' AND o_orderdate < TIMESTAMP '1997-07-01'"
    assert t2.count_planned_files(pred) < t2.count_planned_files()
    assert t2.count_planned_files(pred) == orig.count_planned_files(pred)
    a = orig.scan(pred).orderBy("o_orderkey").collect()
    b = t2.scan(pred).orderBy("o_orderkey").collect()
    assert a == b
    # imported table is SQL-visible through the engine
    n = eng.sql("SELECT COUNT(*) AS n FROM ns.orders_imported").first().n
    assert n == orig.scan().count()


@pytest.mark.slow
def test_export_mor_table_with_delete_manifests(spark, tmp_path, sf_dir):
    """A snapshot holding live position AND equality deletes exports as
    spec v2 with separate delete manifests (content=1 rows, "content":
    "deletes" header) instead of refusing (VERDICT r4 item 5); importing
    the export APPLIES the deletes — no resurrected rows."""
    from iceberg_rust_custom_spark.metadata.avro_codec import read_ocf
    from iceberg_rust_custom_spark.table.maintenance import delete_by_key, delete_where

    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    eng.sql("CREATE TABLE ns.mex (id BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.mex")
    t.append(spark.createDataFrame([(i, float(i)) for i in range(100)], "id long, v double"))
    delete_where(t, "id >= 90", mode="merge-on-read")  # position deletes
    delete_by_key(t, spark.createDataFrame([(5,), (6,)], "id long"))  # equality deletes
    t = eng.load_table("ns.mex")
    assert t.scan().count() == 88

    md_path = eng.export_table("ns.mex", str(tmp_path / "exp_mor"))
    exp_dir = os.path.dirname(os.path.dirname(md_path))

    # manifest list carries content=1 rows pointing at "deletes" manifests
    (ml,) = glob.glob(exp_dir + "/metadata/snap-*.avro")
    _, _, ml_rows = read_ocf(ml)
    by_content = {}
    for r in ml_rows:
        by_content.setdefault(r["content"], []).append(r)
    assert by_content.get(0) and by_content.get(1)
    for r in by_content[1]:
        _, meta, entries = read_ocf(r["manifest_path"])
        assert meta["content"] == b"deletes"
        assert entries and all(e["data_file"]["content"] in (1, 2) for e in entries)
        # delete manifests must never claim data content
        eq = [e for e in entries if e["data_file"]["content"] == 2]
        for e in eq:
            assert e["data_file"]["equality_ids"], "equality delete without key ids"
    for r in by_content[0]:
        _, meta, entries = read_ocf(r["manifest_path"])
        assert meta["content"] == b"data"
        assert all(e["data_file"]["content"] == 0 for e in entries)

    # JVM Avro cross-read of a delete manifest (independent implementation)
    jvm = spark._jvm
    mf = by_content[1][0]["manifest_path"]
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(mf), jvm.org.apache.avro.generic.GenericDatumReader()
    )
    n = 0
    while rdr.hasNext():
        e = rdr.next()
        assert e.get("data_file").get("content") in (1, 2)
        n += 1
    assert n > 0

    # import round-trip applies the deletes
    t2 = eng.import_table("ns.mex_imported", md_path)
    assert t2.scan().count() == 88
    assert t2.scan("id = 5").count() == 0  # equality delete applied
    assert t2.scan("id = 95").count() == 0  # position delete applied
    assert t2.scan("id = 50").count() == 1


@pytest.mark.slow
def test_export_import_eq_delete_key_bounds_and_lineage_marker(spark, tmp_path):
    """r10 (VERDICT r9 item 7): the r9 surface survives the spec-v2
    round-trip both directions —
    (a) multi-part content=2 equality-delete files export with per-file
        KEY BOUNDS + equality_ids (JVM-Avro cross-read), and the import
        preserves them so bounds-based victim pruning still works;
    (b) a lineage-preserved=true rewrite snapshot exports with its summary
        intact, and OUR reader honors the marker on the imported table
        (caught-up changelog range across it replays as zero events)."""
    import pyspark.sql.types as T
    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.table.maintenance import delete_by_key, zorder
    from iceberg_rust_custom_spark.table.scan import (
        data_file_sequence_numbers,
        eq_victim_candidates,
        plan_delete_files,
        plan_files,
    )

    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    t = eng.create_table(
        "ns.r9",
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
        ),
        properties={"write.eq-delete.target-rows": "100"},
    )
    for i in range(5):  # disjoint key ranges per file: prunable layout
        t.append(
            spark.range(100).coalesce(1).select(
                (F.col("id") + i * 100).alias("k"), (F.col("id") * 1.0).alias("v")
            )
        )
    t = zorder(t, ["k"])  # lineage-preserved rewrite; ≥2 range-disjoint files
    rewrite_snap = t.metadata.snapshot_for_ref()
    assert rewrite_snap.summary.get("lineage-preserved") == "true"
    t = delete_by_key(t, list(range(0, 250)), key_cols=["k"])  # multi-part Δ⁻
    assert t.scan().count() == 250

    # ---- (a) head export: eq-delete entries carry key bounds -------------
    md_path = eng.export_table("ns.r9", str(tmp_path / "exp_r9"))
    exp_dir = os.path.dirname(os.path.dirname(md_path))
    (ml,) = glob.glob(exp_dir + "/metadata/snap-*.avro")
    _, _, ml_rows = read_ocf(ml)
    del_manifests = [r for r in ml_rows if r["content"] == 1]
    assert del_manifests
    eq_entries = []
    for r in del_manifests:
        _, meta, entries = read_ocf(r["manifest_path"])
        eq_entries += [e for e in entries if e["data_file"]["content"] == 2]
    assert len(eq_entries) >= 2  # multi-part delete survived export
    kid = t.metadata.current_schema().field_by_name("k").field_id
    for e in eq_entries:
        d = e["data_file"]
        assert d["equality_ids"] == [kid]
        lows = {kv["key"]: kv["value"] for kv in d["lower_bounds"]}
        ups = {kv["key"]: kv["value"] for kv in d["upper_bounds"]}
        assert kid in lows and kid in ups
        assert deserialize_single_value(lows[kid], "long") <= deserialize_single_value(
            ups[kid], "long"
        )
    # independent implementation: JVM Avro decodes the same bounds
    jvm = spark._jvm
    rdr = jvm.org.apache.avro.file.DataFileReader(
        jvm.java.io.File(del_manifests[0]["manifest_path"]),
        jvm.org.apache.avro.generic.GenericDatumReader(),
    )
    saw_eq = False
    while rdr.hasNext():
        e = rdr.next()
        d = e.get("data_file")
        if d.get("content") == 2:
            saw_eq = True
            assert d.get("equality_ids") is not None
            assert d.get("lower_bounds") is not None
    assert saw_eq

    # ---- import direction: bounds + pruning survive -----------------------
    t2 = eng.import_table("ns.r9_imported", md_path)
    assert t2.scan().count() == 250
    assert t2.scan("k = 10").count() == 0 and t2.scan("k = 300").count() == 1
    md2 = t2.metadata
    snap2 = md2.snapshot_for_ref()
    eqs2 = [e for e in plan_delete_files(md2, snap2) if e.data_file.content == 2]
    assert len(eqs2) >= 2
    for e in eqs2:
        assert "k" in e.data_file.lower_bounds and "k" in e.data_file.upper_bounds
    files2 = plan_files(md2, snap2)
    # per delete entry the candidates are bounds-pruned: a delete whose key
    # range covers [0,250) cannot touch a data file bounded in [250,500)
    # (the compacted layout is key-clustered, so at least one file prunes)
    cand = eq_victim_candidates(
        files2, eqs2, md2.current_schema(), data_file_sequence_numbers(md2, snap2)
    )
    assert 0 < len(cand) < len(files2)  # bounds pruned

    # ---- (b) lineage-preserved rewrite snapshot round-trips ---------------
    md_path_rw = eng.export_table(
        "ns.r9", str(tmp_path / "exp_rw"), snapshot_id=rewrite_snap.snapshot_id
    )
    t3 = eng.import_table("ns.r9_rw_imported", md_path_rw)
    snap3 = t3.metadata.snapshot_for_ref()
    assert snap3.summary.get("lineage-preserved") == "true"
    assert snap3.summary.get("rewritten") == "true"
    assert t3.scan().count() == 500  # pre-delete state
    # our changelog honors the marker on the FOREIGN-read table: a
    # caught-up range across the rewrite replays as zero events
    assert t3.changes(snap3.sequence_number - 1).count() == 0


@pytest.mark.slow
def test_v3_export_import_roundtrip_preserves_lineage_and_dvs(spark, tmp_path):
    """r11 (VERDICT r10 #6): format_version=3 export writes v3 metadata
    JSON (format-version 3, next-row-id, per-snapshot first-row-id) and
    keeps deletion vectors as PUFFIN REFS (no parquet materialization);
    the export→import round trip preserves every row's _row_id exactly.
    The v2 export of the same table is the documented degradation: DVs
    materialize as position-delete parquet, data identical, and
    next-row-id (v3-only) is absent from the JSON."""
    import json as _json

    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.table.maintenance import delete_where
    from iceberg_rust_custom_spark.table.scan import plan_delete_files

    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    df = spark.range(500).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    t = eng.create_table("v3.t", df.schema, properties={"write.delete.format": "dv"})
    t.append(df.where("k < 250"))
    t.append(df.where("k >= 250"))
    t = delete_where(t, "k % 50 = 0", mode="merge-on-read")
    src_rows = sorted(
        (r.k, r._row_id) for r in t.scan(row_lineage=True).select("k", "_row_id").collect()
    )
    assert all(rid is not None for _, rid in src_rows)

    # ---- v3 export
    out3 = str(tmp_path / "exp3")
    md3_path = eng.export_table("v3.t", out3, format_version=3)
    md3 = _json.loads(open(md3_path).read())
    assert md3["format-version"] == 3
    assert md3["next-row-id"] == t.metadata.next_row_id > 0
    assert all("first-row-id" in s for s in md3["snapshots"])
    t3 = eng.import_table("v3.timp", md3_path)
    # deletion vectors survived as puffin refs with v3 addressing
    dvs = [
        e.data_file
        for e in plan_delete_files(t3.metadata, t3.metadata.snapshot_for_ref())
        if e.data_file.content == 1
    ]
    assert dvs and all(d.file_format == "puffin" for d in dvs)
    assert all(d.referenced_data_file and d.content_size_in_bytes for d in dvs)
    got3 = sorted(
        (r.k, r._row_id) for r in t3.scan(row_lineage=True).select("k", "_row_id").collect()
    )
    assert got3 == src_rows  # row identity preserved end to end

    # ---- v2 export of the same table: the documented degradation
    out2 = str(tmp_path / "exp2")
    md2_path = eng.export_table("v3.t", out2, format_version=2)
    md2 = _json.loads(open(md2_path).read())
    assert md2["format-version"] == 2 and "next-row-id" not in md2
    t2 = eng.import_table("v3.timp2", md2_path)
    dels2 = [
        e.data_file
        for e in plan_delete_files(t2.metadata, t2.metadata.snapshot_for_ref())
        if e.data_file.content == 1
    ]
    assert dels2 and all(d.file_format != "puffin" for d in dels2)
    assert sorted(r.k for r in t2.scan().collect()) == [k for k, _ in src_rows]
