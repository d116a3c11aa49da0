"""r11 (VERDICT r10 #3): file-group-local MoR apply.

tools/mor_overhead.py shows the MoR scan overhead is a ~2× CONSTANT in
tombstone-file count — the row-address materialization and anti-join
stage dominate, not tombstone volume. So the scan now splits: data files
no pending tombstone can touch read CLEAN (plain parquet read, full
whole-stage codegen), only the touched subset pays the MoR machinery.
Addressing: position-delete files carry (file_path, pos) footer bounds
(r11 writer change), DV blobs name their referenced file, equality
deletes route through the r10 bounds matrix."""

import dataclasses as dc

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.table.maintenance import delete_by_key, delete_where
from iceberg_rust_custom_spark.table.scan import (
    _mor_touched_files,
    canon_path,
    plan_delete_files,
    plan_files,
)


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def _multi_file_table(eng, spark, name="s.t", n=20000, files=6):
    df = spark.range(n).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
    t = eng.create_table(
        name, df.schema, sort_by=["k"],
        properties={"write.distribution-mode": "range", "write.range-partitions": str(files)},
    )
    t.append(df)
    return t


def _touched(t):
    md = t.metadata
    snap = md.snapshot_for_ref()
    return _mor_touched_files(
        plan_files(md, snap),
        plan_delete_files(md, snap),
        md.current_schema(),
        md,
        snap,
        None,
        None,
    )


def test_position_delete_bounds_localize_the_apply(eng, spark):
    t = _multi_file_table(eng, spark)
    files = plan_files(t.metadata, t.metadata.snapshot_for_ref())
    assert len(files) >= 4
    # tombstone 30 rows in ONE k-range → one data file touched
    t = delete_where(t, "k >= 100 AND k < 130", mode="merge-on-read")
    dels = [e.data_file for e in plan_delete_files(t.metadata, t.metadata.snapshot_for_ref())]
    assert dels and all("file_path" in (d.lower_bounds or {}) for d in dels)
    touched = _touched(t)
    assert touched is not None and 1 <= len(touched) < len(files)
    # correctness through the split
    assert t.scan().count() == 20000 - 30
    assert t.scan("k < 200").count() == 200 - 30
    # the victim rows are really gone
    assert t.scan("k >= 100 AND k < 130").count() == 0


def test_dv_deletes_localize_by_referenced_file(eng, spark):
    t = _multi_file_table(eng, spark, name="s.dv")
    t.metadata = t.new_transaction().set_properties({"write.delete.format": "dv"}).commit()
    files = plan_files(t.metadata, t.metadata.snapshot_for_ref())
    t = delete_where(t, "k >= 200 AND k < 240", mode="merge-on-read")
    touched = _touched(t)
    assert touched is not None and 1 <= len(touched) < len(files)
    assert t.scan().count() == 20000 - 40


def test_equality_deletes_localize_via_bounds_matrix(eng, spark):
    t = _multi_file_table(eng, spark, name="s.eq")
    files = plan_files(t.metadata, t.metadata.snapshot_for_ref())
    t = delete_by_key(t, spark.createDataFrame([(500,), (501,)], "k long"))
    touched = _touched(t)
    assert touched is not None and 1 <= len(touched) < len(files)
    assert t.scan().count() == 20000 - 2


def test_legacy_tombstone_without_bounds_disables_split(eng, spark):
    t = _multi_file_table(eng, spark, name="s.leg")
    t = delete_where(t, "k >= 100 AND k < 110", mode="merge-on-read")
    md = t.metadata
    snap = md.snapshot_for_ref()
    files = plan_files(md, snap)
    dels = plan_delete_files(md, snap)
    # simulate a pre-r11 tombstone: strip the path bounds
    stripped = [
        dc.replace(e, data_file=dc.replace(e.data_file, lower_bounds={}, upper_bounds={}))
        for e in dels
    ]
    assert (
        _mor_touched_files(files, stripped, md.current_schema(), md, snap, None, None)
        is None
    )
    # and the unsplit scan stays correct
    assert t.scan().count() == 20000 - 10


def test_split_preserves_results_under_mixed_deletes(eng, spark):
    """Position + equality + a second position commit, deletes landing in
    different files; the split scan's result must equal the logical
    multiset exactly (row-level ground truth recomputed in Spark)."""
    t = _multi_file_table(eng, spark, name="s.mix")
    t = delete_where(t, "k >= 1000 AND k < 1050", mode="merge-on-read")
    t = delete_by_key(t, spark.createDataFrame([(3,), (19999,)], "k long"))
    t = delete_where(t, "k >= 15000 AND k < 15010", mode="merge-on-read")
    got = sorted(r.k for r in t.scan().collect())
    want = [
        k
        for k in range(20000)
        if not (1000 <= k < 1050) and k not in (3, 19999) and not (15000 <= k < 15010)
    ]
    assert got == want
    # aggregation over the split union stays exact too
    assert t.scan().agg(F.sum("k")).first()[0] == sum(want)


def test_touched_set_unions_pos_ranges_and_dv_references():
    """Pure-unit: overlapping path ranges, DV references, and files outside
    every range compose into one conservative touched set."""
    from iceberg_rust_custom_spark.metadata.manifest import DataFile

    def df_(p):
        return DataFile(file_path=p, record_count=1, file_size_in_bytes=1)

    files = [df_(f"/d/f{i}.parquet") for i in range(6)]

    class E:
        def __init__(self, d):
            self.data_file = d
            self.sequence_number = 5

    pos = DataFile(
        file_path="/d/del1.parquet",
        record_count=2,
        file_size_in_bytes=1,
        content=1,
        lower_bounds={"file_path": "file:///d/f1.parquet", "pos": 0},
        upper_bounds={"file_path": "file:///d/f2.parquet", "pos": 9},
    )
    dv = DataFile(
        file_path="/d/c.puffin",
        record_count=2,
        file_size_in_bytes=1,
        content=1,
        file_format="puffin",
        referenced_data_file="file:///d/f4.parquet",
    )
    got = _mor_touched_files(files, [E(pos), E(dv)], None, None, None, None, None)
    assert got == {canon_path(p) for p in ("/d/f1.parquet", "/d/f2.parquet", "/d/f4.parquet")}


def test_percent_encoded_bounds_disable_the_split():
    """Review r11: percent-decoding is not order-preserving ('%20' sorts
    above '!' encoded but ' ' sorts below it decoded), so bounds or file
    paths containing characters URI encoding would rewrite must disable
    the range-based split (bounds) or classify conservatively dirty
    (paths) — never a bracketing decision in mixed domains."""
    from iceberg_rust_custom_spark.metadata.manifest import DataFile

    class E:
        def __init__(self, d):
            self.data_file = d
            self.sequence_number = 5

    files = [
        DataFile(file_path=f"/d/f{i}.parquet", record_count=1, file_size_in_bytes=1)
        for i in range(3)
    ]
    enc = DataFile(
        file_path="/d/del.parquet",
        record_count=1,
        file_size_in_bytes=1,
        content=1,
        lower_bounds={"file_path": "file:///d/k=a%20b/f.parquet", "pos": 0},
        upper_bounds={"file_path": "file:///d/k=z/f.parquet", "pos": 1},
    )
    assert _mor_touched_files(files, [E(enc)], None, None, None, None, None) is None
    # safe bounds + an unsafe FILE path: that file is conservatively dirty
    ok = DataFile(
        file_path="/d/del2.parquet",
        record_count=1,
        file_size_in_bytes=1,
        content=1,
        lower_bounds={"file_path": "file:///d/f9.parquet", "pos": 0},
        upper_bounds={"file_path": "file:///d/f9.parquet", "pos": 1},
    )
    weird = DataFile(file_path="/d/k=a b/g.parquet", record_count=1, file_size_in_bytes=1)
    got = _mor_touched_files(files + [weird], [E(ok)], None, None, None, None, None)
    assert got == {"/d/k=a b/g.parquet"}  # outside-range safe files stay clean
