"""Iceberg reserved metadata columns on scans: _file, _pos, _spec_id,
_partition (spec "Reserved field IDs" 2147483646/45/.. — exposed as
scan(metadata_columns=[...]); the reference has no metadata-column
support)."""

import json

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.table.maintenance import delete_where

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def test_file_and_pos(eng, spark):
    eng.sql("CREATE TABLE ns.m1 (id BIGINT) STORED AS ICEBERG")
    t = eng.load_table("ns.m1")
    t.append(spark.range(4).select("id"))
    t.append(spark.range(4, 6).select("id"))
    df = t.scan(metadata_columns=["_file", "_pos"])
    assert df.columns == ["id", "_file", "_pos"]
    rows = df.collect()
    n_files = t.count_planned_files()
    assert len({r._file for r in rows}) == n_files
    # positions start at 0 within every file
    by_file = {}
    for r in rows:
        by_file.setdefault(r._file, []).append(r._pos)
    for poss in by_file.values():
        assert sorted(poss) == list(range(len(poss)))


@pytest.mark.slow
def test_partition_and_spec_id_across_evolution(eng, spark):
    eng.sql(
        "CREATE TABLE ns.m2 (id BIGINT, part BIGINT) STORED AS ICEBERG PARTITIONED BY (part)"
    )
    t = eng.load_table("ns.m2")
    t.append(spark.createDataFrame([(1, 0), (2, 1)], "id long, part long"))
    t.update_partition_spec("bucket(4, id)")
    t = eng.load_table("ns.m2")
    t.append(spark.createDataFrame([(3, 7)], "id long, part long"))
    rows = t.scan(metadata_columns=["_spec_id", "_partition"]).collect()
    by_id = {r.id: (r._spec_id, json.loads(r._partition)) for r in rows}
    assert by_id[1][1] == {"part": 0} and by_id[2][1] == {"part": 1}
    assert "id_bucket" in by_id[3][1]
    assert by_id[1][0] != by_id[3][0]  # written under different specs


def test_metadata_columns_with_mor_delete_and_selection(eng, spark):
    eng.sql("CREATE TABLE ns.m3 (id BIGINT, v STRING) STORED AS ICEBERG")
    t = eng.load_table("ns.m3")
    t.append(spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id long, v string"))
    delete_where(t, "id = 2", mode="merge-on-read")
    t = eng.load_table("ns.m3")
    df = t.scan(columns=["id"], metadata_columns=["_file", "_pos"])
    assert df.columns == ["id", "_file", "_pos"]
    assert {r.id for r in df.collect()} == {1, 3}


def test_unknown_metadata_column_rejected(eng, spark):
    eng.sql("CREATE TABLE ns.m4 (id BIGINT) STORED AS ICEBERG")
    t = eng.load_table("ns.m4")
    t.append(spark.range(1).select("id"))
    with pytest.raises(ValueError, match="metadata columns"):
        t.scan(metadata_columns=["_nope"]).collect()


def test_metadata_columns_compose_with_row_lineage(eng, spark):
    eng.sql("CREATE TABLE ns.m5 (id BIGINT) STORED AS ICEBERG")
    t = eng.load_table("ns.m5")
    t.append(spark.range(3).select("id"))
    df = t.scan(row_lineage=True, metadata_columns=["_pos"])
    rows = {(r.id, r._row_id, r._pos) for r in df.collect()}
    assert all(r[1] is not None and r[2] is not None for r in rows)


@pytest.mark.slow
def test_v3_read_views_in_sql(eng, spark):
    """SQL surface for the v3 reads: ns.t.row_lineage, ns.t.with_metadata,
    ns.t.changes (changelog with update detection)."""
    from iceberg_rust_custom_spark.table.maintenance import update_where

    eng.sql("CREATE TABLE ns.sqlv (id BIGINT, v STRING) STORED AS ICEBERG")
    eng.sql("INSERT INTO ns.sqlv VALUES (1, 'a'), (2, 'b')")
    rows = eng.sql("SELECT id, _row_id FROM ns.sqlv.row_lineage ORDER BY _row_id").collect()
    assert [r._row_id for r in rows] == [0, 1]
    meta = eng.sql(
        "SELECT id, _file, _pos, _partition FROM ns.sqlv.with_metadata"
    ).collect()
    # positions start at 0 within every data file
    by_file = {}
    for r in meta:
        by_file.setdefault(r._file, []).append(r._pos)
    assert len(meta) == 2
    assert all(sorted(p) == list(range(len(p))) for p in by_file.values())
    update_where(eng.load_table("ns.sqlv"), {"v": "'B'"}, "id = 2", mode="merge-on-read")
    ch = eng.sql(
        "SELECT _change_type, COUNT(*) AS n FROM ns.sqlv.changes GROUP BY 1"
    ).collect()
    got = {r._change_type: r.n for r in ch}
    assert got == {"insert": 2, "update_before": 1, "update_after": 1}
