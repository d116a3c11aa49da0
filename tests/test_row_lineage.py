"""Iceberg v3 row lineage: _row_id / _last_updated_sequence_number.

Spec "Row Lineage": commits that add data files reserve a block of row ids
starting at the table's next-row-id; rows inherit first_row_id + position
unless the file carries explicit lineage columns (written by rewrites,
which MUST preserve row identity). The reference tracks format v2 only
(iceberg-rust-spec/src/spec/table_metadata.rs:51-138 has no next-row-id),
so this is v3-spec parity beyond it.
"""

import pytest

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.table.maintenance import compact, delete_where

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def _mk(eng, spark, name):
    eng.sql(f"CREATE TABLE {name} (id BIGINT, v STRING) STORED AS ICEBERG")
    t = eng.load_table(name)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    return t


def test_append_assigns_contiguous_row_ids(eng, spark):
    t = _mk(eng, spark, "ns.rl1")
    rows = [(r.id, r._row_id, r._last_updated_sequence_number)
            for r in t.scan(row_lineage=True).collect()]
    assert sorted(r[1] for r in rows) == [0, 1, 2]
    # first append (seq 1) holds ids {0,1}, second (seq 2) id {2}
    by_id = {r[0]: r for r in rows}
    assert {by_id[1][1], by_id[2][1]} == {0, 1}
    assert by_id[3][1] == 2
    assert by_id[1][2] == by_id[2][2] == 1 and by_id[3][2] == 2
    # next-row-id persisted in metadata JSON
    t2 = eng.load_table("ns.rl1")
    assert t2.metadata.next_row_id == 3


def test_plain_scan_unaffected(eng, spark):
    t = _mk(eng, spark, "ns.rl2")
    assert set(t.scan().columns) == {"id", "v"}
    assert t.scan().count() == 3


def test_mor_delete_preserves_row_ids(eng, spark):
    t = _mk(eng, spark, "ns.rl3")
    before = {(r.id, r._row_id) for r in t.scan(row_lineage=True).collect()}
    delete_where(t, "id = 2", mode="merge-on-read")
    t = eng.load_table("ns.rl3")
    after = {(r.id, r._row_id) for r in t.scan(row_lineage=True).collect()}
    assert after == {p for p in before if p[0] != 2}


def test_compact_preserves_lineage_and_appends_dont_collide(eng, spark):
    t = _mk(eng, spark, "ns.rl4")
    before = {(r.id, r._row_id, r._last_updated_sequence_number)
              for r in t.scan(row_lineage=True).collect()}
    compact(t)
    t = eng.load_table("ns.rl4")
    after = {(r.id, r._row_id, r._last_updated_sequence_number)
             for r in t.scan(row_lineage=True).collect()}
    assert after == before  # rewritten files carry EXPLICIT lineage columns
    # the compacted file is marked explicit, never re-assigned
    live = [f for f in __import__(
        "iceberg_rust_custom_spark.table.scan", fromlist=["plan_files"]
    ).plan_files(t.metadata, t.metadata.snapshot_for_ref())]
    assert all(f.first_row_id == -1 for f in live)
    # new rows continue AFTER the reserved space — no id reuse
    t.append(spark.createDataFrame([(4, "d")], "id long, v string"))
    ids = [r._row_id for r in t.scan(row_lineage=True).collect()]
    assert sorted(ids) == [0, 1, 2, 3]
    # compacted table still scans clean without lineage
    assert set(t.scan().columns) == {"id", "v"}


def test_compact_after_mor_delete_preserves_surviving_ids(eng, spark):
    t = _mk(eng, spark, "ns.rl5")
    delete_where(t, "id = 1", mode="merge-on-read")
    t = eng.load_table("ns.rl5")
    before = {(r.id, r._row_id) for r in t.scan(row_lineage=True).collect()}
    compact(t)  # materializes the MoR delete AND the lineage
    t = eng.load_table("ns.rl5")
    after = {(r.id, r._row_id) for r in t.scan(row_lineage=True).collect()}
    assert after == before and len(after) == 2


def test_lineage_survives_avro_manifests(eng, spark, tmp_path):
    eng.sql(
        "CREATE TABLE ns.rlavro (id BIGINT, v STRING) STORED AS ICEBERG "
        "TBLPROPERTIES ('write.metadata.format'='avro')"
    )
    t = eng.load_table("ns.rlavro")
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    t = eng.load_table("ns.rlavro")  # re-plan through the Avro round trip
    rows = {(r.id, r._row_id) for r in t.scan(row_lineage=True).collect()}
    assert sorted(r[1] for r in rows) == [0, 1, 2]


def test_lineage_with_schema_evolution(eng, spark):
    t = _mk(eng, spark, "ns.rl6")
    t.update_schema().add_column("w", "long").commit()
    t.append(spark.createDataFrame([(4, "d", 40)], "id long, v string, w long"))
    rows = {(r.id, r._row_id, r.w) for r in t.scan(row_lineage=True).collect()}
    assert sorted(r[1] for r in rows) == [0, 1, 2, 3]
    assert {r[2] for r in rows} == {None, 40}


def test_columns_selection_keeps_lineage(eng, spark):
    t = _mk(eng, spark, "ns.rl7")
    df = t.scan(columns=["id"], row_lineage=True)
    assert df.columns == ["id", "_row_id", "_last_updated_sequence_number"]
    assert df.count() == 3


def test_pre_lineage_files_read_null_ids(eng, spark, tmp_path):
    """Files committed before lineage assignment existed (first_row_id
    null in the manifest, no explicit columns in the file) surface NULL
    lineage — the spec's 'unassigned rows' state, never a fabricated id —
    while later appends in the same table still get real ids."""
    from iceberg_rust_custom_spark.table.write import write_partitioned

    eng.sql("CREATE TABLE ns.rl8 (id BIGINT, v STRING) STORED AS ICEBERG")
    t = eng.load_table("ns.rl8")
    files = write_partitioned(
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        t.metadata,
        str(tmp_path / "legacy"),
    )
    tx = t.new_transaction().append(files)
    tx._assign_row_ids = []  # simulate a pre-v3 writer: no block reserved
    t.metadata = tx.commit()
    t = eng.load_table("ns.rl8")
    t.append(spark.createDataFrame([(3, "c")], "id long, v string"))
    by_id = {r.id: r._row_id for r in t.scan(row_lineage=True).collect()}
    assert by_id[1] is None and by_id[2] is None
    # the v3 append starts at next-row-id 0 — legacy files reserved nothing
    assert by_id[3] == 0


def test_cow_delete_preserves_survivor_ids(eng, spark):
    t = _mk(eng, spark, "ns.rl9")
    before = {(r.id, r._row_id) for r in t.scan(row_lineage=True).collect()}
    delete_where(t, "id = 2", mode="copy-on-write")
    t = eng.load_table("ns.rl9")
    after = {(r.id, r._row_id) for r in t.scan(row_lineage=True).collect()}
    assert after == {p for p in before if p[0] != 2}


def test_cow_update_keeps_id_bumps_sequence(eng, spark):
    from iceberg_rust_custom_spark.table.maintenance import update_where

    t = _mk(eng, spark, "ns.rl10")
    before = {r.id: (r._row_id, r._last_updated_sequence_number)
              for r in t.scan(row_lineage=True).collect()}
    update_where(t, {"v": "'B'"}, "id = 2", mode="copy-on-write")
    t = eng.load_table("ns.rl10")
    after = {r.id: (r.v, r._row_id, r._last_updated_sequence_number)
             for r in t.scan(row_lineage=True).collect()}
    assert after[2][0] == "B"
    assert after[2][1] == before[2][0]  # _row_id preserved
    assert after[2][2] > before[2][1]  # last_updated bumped to the UPDATE commit
    # untouched row carried in the same rewritten file keeps BOTH
    assert after[1][1] == before[1][0] and after[1][2] == before[1][1]


def test_mor_update_keeps_id_bumps_sequence(eng, spark):
    from iceberg_rust_custom_spark.table.maintenance import update_where

    t = _mk(eng, spark, "ns.rl11")
    before = {r.id: (r._row_id, r._last_updated_sequence_number)
              for r in t.scan(row_lineage=True).collect()}
    update_where(t, {"v": "'B'"}, "id = 2", mode="merge-on-read")
    t = eng.load_table("ns.rl11")
    after = {r.id: (r.v, r._row_id, r._last_updated_sequence_number)
             for r in t.scan(row_lineage=True).collect()}
    assert after[2] == ("B", before[2][0], t.metadata.last_sequence_number)
    assert after[1] == ("a", before[1][0], before[1][1])


def _merge_case(eng, spark, name, mode):
    from iceberg_rust_custom_spark.table.maintenance import merge_upsert

    t = _mk(eng, spark, name)
    before = {r.id: (r._row_id, r._last_updated_sequence_number)
              for r in t.scan(row_lineage=True).collect()}
    src = spark.createDataFrame([(2, "B"), (9, "new")], "id long, v string")
    merge_upsert(t, src, ["id"], mode=mode)
    t = eng.load_table(name)
    after = {r.id: (r.v, r._row_id, r._last_updated_sequence_number)
             for r in t.scan(row_lineage=True).collect()}
    # updated key keeps its _row_id, sequence bumps
    assert after[2][0] == "B" and after[2][1] == before[2][0]
    assert after[2][2] > before[2][1]
    # carried rows keep both
    assert after[1] == ("a", before[1][0], before[1][1])
    assert after[3] == ("c", before[3][0], before[3][1])
    # brand-new key gets a FRESH id, distinct from every live id
    ids = [v[1] for v in after.values()]
    assert len(set(ids)) == len(ids)
    assert after[9][1] not in {v[0] for v in before.values()}


def test_cow_merge_lineage(eng, spark):
    _merge_case(eng, spark, "ns.rl12", "copy-on-write")


@pytest.mark.slow
def test_mor_merge_lineage(eng, spark):
    _merge_case(eng, spark, "ns.rl13", "merge-on-read")


def test_zorder_preserves_lineage(eng, spark):
    from iceberg_rust_custom_spark.table.maintenance import zorder

    t = _mk(eng, spark, "ns.rl14")
    before = {(r.id, r._row_id, r._last_updated_sequence_number)
              for r in t.scan(row_lineage=True).collect()}
    zorder(t, ["id"])
    t = eng.load_table("ns.rl14")
    after = {(r.id, r._row_id, r._last_updated_sequence_number)
             for r in t.scan(row_lineage=True).collect()}
    assert after == before


def test_dynamic_overwrite_carried_lineage_with_pending_dv(eng, spark):
    """Partitioned table, MoR delete pending on a carried partition, then a
    dynamic overwrite of the OTHER partition: the materialized carried file
    keeps surviving rows' ids; replaced-partition rows get fresh ids."""
    from pyspark.sql import functions as F

    eng.sql(
        "CREATE TABLE ns.rl15 (id BIGINT, part BIGINT, v STRING) STORED AS ICEBERG "
        "PARTITIONED BY (part) "
        "TBLPROPERTIES ('write.delete.format'='dv')"
    )
    t = eng.load_table("ns.rl15")
    t.append(spark.createDataFrame(
        [(1, 0, "a"), (2, 0, "b"), (3, 1, "c"), (4, 1, "d")],
        "id long, part long, v string"))
    before = {r.id: r._row_id for r in t.scan(row_lineage=True).collect()}
    delete_where(t, "id = 1", mode="merge-on-read")
    t = eng.load_table("ns.rl15")
    t.dynamic_overwrite(spark.createDataFrame([(5, 1, "e")], "id long, part long, v string"))
    t = eng.load_table("ns.rl15")
    after = {r.id: r._row_id for r in t.scan(row_lineage=True).collect()}
    assert set(after) == {2, 5}
    assert after[2] == before[2]  # survivor in the carried partition
    assert after[5] not in before.values()  # replacement row: fresh id


def test_changes_with_lineage_append_only(eng, spark):
    t = _mk(eng, spark, "ns.rl16")
    ch = t.changes(0, with_lineage=True)
    rows = {(r.id, r._row_id, r._change_type) for r in ch.collect()}
    assert {r[2] for r in rows} == {"insert"}
    assert sorted(r[1] for r in rows) == [0, 1, 2]


def test_changes_detects_mor_update(eng, spark):
    """A MoR UPDATE commit (tombstone + re-append sharing _row_id) reads
    back from the changelog as one logical update."""
    from iceberg_rust_custom_spark.table.maintenance import update_where

    t = _mk(eng, spark, "ns.rl17")
    s = t.metadata.last_sequence_number
    update_where(t, {"v": "'B'"}, "id = 2", mode="merge-on-read")
    t = eng.load_table("ns.rl17")
    ch = {(r.id, r.v, r._change_type) for r in t.changes(s, with_lineage=True).collect()}
    assert ch == {(2, "b", "update_before"), (2, "B", "update_after")}
    # without lineage the same commit replays as raw delete+insert
    raw = {(r.id, r.v, r._change_type) for r in t.changes(s).collect()}
    assert raw == {(2, "b", "delete"), (2, "B", "insert")}


@pytest.mark.slow
def test_changes_mor_merge_mixed_update_and_insert(eng, spark):
    from iceberg_rust_custom_spark.table.maintenance import merge_upsert

    t = _mk(eng, spark, "ns.rl18")
    s = t.metadata.last_sequence_number
    src = spark.createDataFrame([(2, "B"), (9, "new")], "id long, v string")
    merge_upsert(t, src, ["id"], mode="merge-on-read")
    t = eng.load_table("ns.rl18")
    ch = {(r.id, r.v, r._change_type) for r in t.changes(s, with_lineage=True).collect()}
    assert ch == {
        (2, "b", "update_before"),
        (2, "B", "update_after"),
        (9, "new", "insert"),
    }


def test_changes_still_rejects_true_rewrites(eng, spark):
    """r9: compact() is changelog-TRANSPARENT (zero net row change) —
    changes() across it yields zero events instead of raising. Net-row-
    change rewrites (overwrite) still reject."""
    t = _mk(eng, spark, "ns.rl19")
    s = t.metadata.last_sequence_number
    compact(t)
    assert eng.load_table("ns.rl19").changes(s).count() == 0
    t = eng.load_table("ns.rl19")
    t.overwrite(t.scan().limit(2))  # genuine file-set replacement
    with pytest.raises(ValueError, match="file-set replacement"):
        eng.load_table("ns.rl19").changes(s)


@pytest.mark.parametrize("fmt", ["parquet", "avro"])
@pytest.mark.slow
def test_first_row_id_marker_survives_manifest_roundtrip(eng, spark, fmt):
    """r8 regression (found by the transaction fuzz): the internal
    first_row_id=-1 'explicit lineage columns in file' marker is exported
    as null in Avro manifests (spec demands a non-negative base) and MUST
    come back as -1 on import — a None round-trip made lineage-liveness
    checks go false, so a CoW UPDATE after compact() re-read the table
    without lineage and the rewrite commit minted FRESH row ids
    (_row_id 0 became 4)."""
    from iceberg_rust_custom_spark.table.maintenance import (
        compact,
        merge_upsert,
        update_where,
    )
    from iceberg_rust_custom_spark.table.scan import plan_files

    eng.sql(
        f"CREATE TABLE ns.rt_{fmt} (id BIGINT, k BIGINT, v BIGINT) STORED AS ICEBERG "
        f"TBLPROPERTIES ('write.metadata.format'='{fmt}')"
    )
    t = eng.load_table(f"ns.rt_{fmt}")
    merge_upsert(t, spark.createDataFrame([(0, 3, 41)], "id long, k long, v long"), ["id"])
    merge_upsert(
        t, spark.createDataFrame([(0, 3, 79), (1, 3, 79)], "id long, k long, v long"), ["id"]
    )
    t.append(spark.createDataFrame([(2, 2, 20), (3, 2, 30)], "id long, k long, v long"))
    t = compact(t)
    files = plan_files(t.metadata, t.metadata.snapshot_for_ref())
    assert [f.first_row_id for f in files] == [-1], files  # marker survived
    before = {(r.id, r._row_id) for r in t.scan(row_lineage=True).collect()}
    t = update_where(t, {"v": "v + 1"}, "k = 3", mode="copy-on-write")
    after = {(r.id, r._row_id) for r in t.scan(row_lineage=True).collect()}
    assert after == before, (before, after)
