"""End-to-end table tests: the reference's primary correctness harness shape
(datafusion_iceberg/src/table.rs:601-716 — insert → group-by-sum with exact
values), plus pruning, time travel, compaction, branches, CAS conflicts."""

import datetime as dt
import os

import pytest

from iceberg_rust_custom_spark.catalog.base import CommitFailed, Identifier
from iceberg_rust_custom_spark.catalog.sql_catalog import SqlCatalog
from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
from iceberg_rust_custom_spark.table.maintenance import compact, expire_snapshots

ORDERS_SCHEMA = Schema(
    0,
    (
        NestedField(1, "id", "long", True),
        NestedField(2, "customer_id", "long", True),
        NestedField(3, "product_id", "long", True),
        NestedField(4, "date", "date", True),
        NestedField(5, "amount", "int", True),
    ),
)

# the reference's canonical rows (datafusion_iceberg/src/table.rs:611-667)
ROWS_BATCH1 = [
    (1, 1, 1, dt.date(2020, 1, 1), 1),
    (2, 2, 1, dt.date(2020, 1, 1), 1),
    (3, 3, 1, dt.date(2020, 1, 1), 3),
    (4, 1, 2, dt.date(2020, 2, 2), 1),
    (5, 1, 1, dt.date(2020, 2, 2), 2),
    (6, 3, 3, dt.date(2020, 2, 2), 3),
]
ROWS_BATCH2 = [
    (7, 1, 3, dt.date(2020, 1, 3), 1),
    (8, 2, 1, dt.date(2020, 1, 3), 2),
    (9, 2, 2, dt.date(2020, 1, 3), 1),
]


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "warehouse"))


def _orders_df(spark, rows):
    return spark.createDataFrame(rows, ORDERS_SCHEMA.spark_schema())


def test_insert_query_flagship(engine, spark):
    """create → append ×2 → SELECT product_id, SUM(amount) GROUP BY — exact
    values asserted, as the reference does at table.rs:698-716."""
    t = engine.create_table("test.orders", ORDERS_SCHEMA, partition_by=[("date", "day")])
    t.append(_orders_df(spark, ROWS_BATCH1))
    t.append(_orders_df(spark, ROWS_BATCH2))

    got = {
        r["product_id"]: r["total"]
        for r in t.scan()
        .groupBy("product_id")
        .agg({"amount": "sum"})
        .withColumnRenamed("sum(amount)", "total")
        .collect()
    }
    assert got == {1: 9, 2: 2, 3: 4}


def test_partition_pruning_skips_files(engine, spark):
    t = engine.create_table("test.orders2", ORDERS_SCHEMA, partition_by=[("date", "day")])
    t.append(_orders_df(spark, ROWS_BATCH1 + ROWS_BATCH2))
    all_files = t.count_planned_files()
    assert all_files >= 3  # three distinct days
    pruned = t.count_planned_files("date = '2020-01-01'")
    assert pruned < all_files
    assert t.scan("date = '2020-01-01'").count() == 3
    # file-level stats pruning on a non-partition column
    pruned2 = t.count_planned_files("id > 8")
    assert pruned2 <= all_files
    assert t.scan("id > 8").count() == 1


def test_time_travel_and_incremental(engine, spark):
    t = engine.create_table("test.orders3", ORDERS_SCHEMA)
    t.append(_orders_df(spark, ROWS_BATCH1))
    snap1 = t.metadata.current_snapshot_id
    seq1 = t.metadata.last_sequence_number
    t.append(_orders_df(spark, ROWS_BATCH2))
    assert t.scan().count() == 9
    assert t.scan(snapshot_id=snap1).count() == 6  # time travel by snapshot
    inc = t.incremental_scan(from_sequence_number=seq1)
    assert inc.count() == 3  # only batch 2


def test_overwrite_and_compaction(engine, spark):
    t = engine.create_table("test.orders4", ORDERS_SCHEMA)
    t.append(_orders_df(spark, ROWS_BATCH1))
    t.append(_orders_df(spark, ROWS_BATCH2))
    files_before = t.count_planned_files()
    compact(t)
    assert t.scan().count() == 9  # same data
    assert t.count_planned_files() <= files_before
    # r9: compaction retains history by default (Iceberg model — expiry is
    # a separate policy; keeps time travel, MV anchors and changelog
    # segment replay alive) and stamps changelog transparency
    assert len(t.metadata.snapshots) == 3
    head = t.metadata.snapshot_for_ref()
    assert head.summary.get("lineage-preserved") == "true"
    # destructive opt-in restores the reference's behavior
    compact(t, retain_history=False)
    assert len(t.metadata.snapshots) == 1
    assert t.scan().count() == 9

    t.overwrite(_orders_df(spark, ROWS_BATCH2))
    assert t.scan().count() == 3


def test_branches_and_expiry(engine, spark):
    t = engine.create_table("test.orders5", ORDERS_SCHEMA)
    t.append(_orders_df(spark, ROWS_BATCH1))
    main_snap = t.metadata.current_snapshot_id
    # tag the current snapshot, then append more to main
    t.metadata = t.new_transaction().set_ref("v1", main_snap, "tag").commit()
    t.append(_orders_df(spark, ROWS_BATCH2))
    t.append(_orders_df(spark, ROWS_BATCH1))
    assert t.scan(branch="v1").count() == 6
    assert t.scan().count() == 15
    expire_snapshots(t, keep_last=1)
    assert t.scan(branch="v1").count() == 6  # tagged snapshot survives expiry
    assert t.scan().count() == 15


def test_cas_conflict_append_retries(engine, spark):
    t = engine.create_table("test.orders6", ORDERS_SCHEMA)
    t.append(_orders_df(spark, ROWS_BATCH1))
    stale = engine.load_table("test.orders6")  # loads current metadata
    t.append(_orders_df(spark, ROWS_BATCH2))  # advances the pointer
    # stale handle appends: first CAS fails, retry on fresh metadata succeeds
    stale.append(_orders_df(spark, ROWS_BATCH1))
    assert engine.load_table("test.orders6").scan().count() == 15


def test_sql_catalog_cas(tmp_path):
    cat = SqlCatalog(str(tmp_path / "catalog.db"))
    ident = Identifier.parse("ns.t1")
    cat.register(ident, "/tmp/v0.json")
    assert cat.load(ident) == ("/tmp/v0.json", "table")
    cat.swap(ident, "/tmp/v0.json", "/tmp/v1.json")
    with pytest.raises(CommitFailed):
        cat.swap(ident, "/tmp/v0.json", "/tmp/v2.json")
    assert cat.load(ident)[0] == "/tmp/v1.json"


def test_glue_catalog_cas(tmp_path):
    from iceberg_rust_custom_spark.catalog.glue_catalog import FakeGlueClient, GlueCatalog

    cat = GlueCatalog(FakeGlueClient())
    ident = Identifier.parse("ns.t1")
    cat.register(ident, "/tmp/v0.json")
    assert cat.load(ident) == ("/tmp/v0.json", "table")
    assert cat.list_tabulars(("ns",)) == [ident]
    cat.swap(ident, "/tmp/v0.json", "/tmp/v1.json")
    with pytest.raises(CommitFailed):
        cat.swap(ident, "/tmp/v0.json", "/tmp/v2.json")
    assert cat.load(ident)[0] == "/tmp/v1.json"
    cat.drop(ident)
    assert not cat.tabular_exists(ident)


def test_glue_catalog_version_id_race(tmp_path):
    """A writer that read version N loses to one that committed N+1 in
    between — the Glue-side ConcurrentModificationException surfaces as
    CommitFailed (lib.rs:617-659 semantics)."""
    from iceberg_rust_custom_spark.catalog.glue_catalog import FakeGlueClient, GlueCatalog

    client = FakeGlueClient()
    cat = GlueCatalog(client)
    ident = Identifier.parse("ns.t2")
    cat.register(ident, "/tmp/v0.json")
    # simulate a concurrent update that bumps VersionId but keeps the pointer
    t = client.get_table(DatabaseName="ns", Name="t2")["Table"]
    client.update_table(DatabaseName="ns", TableInput={"Name": "t2", "Parameters": t["Parameters"]})
    stale = dict(t)  # version read before the concurrent update
    with pytest.raises(Exception):
        client.update_table(
            DatabaseName="ns",
            TableInput={"Name": "t2", "Parameters": t["Parameters"]},
            VersionId=stale["VersionId"],
        )
    # the catalog path re-reads, so its swap still succeeds
    cat.swap(ident, "/tmp/v0.json", "/tmp/v1.json")
    assert cat.load(ident)[0] == "/tmp/v1.json"


def test_glue_catalog_engine_roundtrip(spark, tmp_path):
    from iceberg_rust_custom_spark.catalog.glue_catalog import FakeGlueClient, GlueCatalog
    from iceberg_rust_custom_spark.engine import Engine

    eng = Engine(spark, catalog=GlueCatalog(FakeGlueClient()), warehouse=str(tmp_path / "wh"))
    t = eng.create_table("glue_ns.orders", ORDERS_SCHEMA)
    t.append(_orders_df(spark, ROWS_BATCH1))
    t.append(_orders_df(spark, ROWS_BATCH2))
    assert eng.load_table("glue_ns.orders").scan().count() == len(ROWS_BATCH1) + len(ROWS_BATCH2)


def test_schema_evolution(engine, spark):
    t = engine.create_table("test.orders7", ORDERS_SCHEMA)
    t.append(_orders_df(spark, ROWS_BATCH1))
    new_schema = Schema(
        1, ORDERS_SCHEMA.fields + (NestedField(6, "note", "string", False),)
    )
    t.metadata = t.new_transaction().add_schema(new_schema).set_current_schema(1).commit()
    t2 = engine.load_table("test.orders7")
    assert t2.metadata.current_schema_id == 1
    df = t2.scan()
    assert "note" in df.columns
    assert df.count() == 6  # old files read with nulls for the new column


def test_branches_and_tags(engine, spark):
    """Branch writes advance independently of main; tags pin a snapshot
    (snapshot.rs:242-281; branch-aware lookup table_metadata.rs:140-277)."""
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    schema = Schema(0, (NestedField(1, "id", "long", False), NestedField(2, "v", "string", False)))
    t = engine.create_table("ns.br", schema)
    t.append(spark.createDataFrame([(1, "main1")], "id long, v string"))
    t.create_tag("v1")
    t.create_branch("dev")
    t.append(spark.createDataFrame([(2, "dev1")], "id long, v string"), branch="dev")
    t.append(spark.createDataFrame([(3, "main2")], "id long, v string"))  # main

    main_rows = {r.id for r in t.scan().collect()}
    dev_rows = {r.id for r in t.scan(branch="dev").collect()}
    tag_rows = {r.id for r in t.scan(branch="v1").collect()}
    assert main_rows == {1, 3}
    assert dev_rows == {1, 2}
    assert tag_rows == {1}
    kinds = {name: r.ref_type for name, r in t.refs().items()}
    assert kinds["v1"] == "tag" and kinds["dev"] == "branch"


def test_files_df_matches_driver_planning(engine, spark):
    """Distributed manifest scan (files_df) and driver-side plan_files see
    the same live file set — the scale path is interchangeable."""
    from iceberg_rust_custom_spark.table.scan import files_df, plan_files

    engine.sql(
        "CREATE TABLE ns.fdf (id BIGINT, d DATE) STORED AS ICEBERG PARTITIONED BY (month(d))"
    )
    t = engine.load_table("ns.fdf")
    import datetime as dt

    for m in (1, 2, 3):
        t.append(
            spark.createDataFrame(
                [(i, dt.date(2021, m, 1 + i % 27)) for i in range(20)], "id long, d date"
            )
        )
    snap = t.metadata.snapshot_for_ref()
    driver_side = sorted(f.file_path for f in plan_files(t.metadata, snap))
    distributed = sorted(
        r.file_path for r in files_df(spark, t.metadata, snap).where("content = 0").collect()
    )
    assert driver_side == distributed
    # metadata tables expose the same info without driver materialization
    assert t.files().count() == len(driver_side)
    assert t.entries().selectExpr("sum(record_count) AS n").first().n == 60


def test_range_distribution_clusters_files_for_pruning(engine, spark):
    """write.distribution-mode=range + sort order → files carry disjoint
    key ranges, so stats pruning hits ~1 file for a point/range query even
    on an UNPARTITIONED table."""
    from iceberg_rust_custom_spark.table.scan import plan_files

    t = engine.create_table(
        "ns.rng",
        spark.createDataFrame([(0, 0.0)], "id long, v double").schema,
        sort_by=["id"],
        properties={"write.distribution-mode": "range", "write.range-partitions": "8"},
    )
    t.append(spark.createDataFrame([(i, float(i)) for i in range(1000)], "id long, v double"))
    snap = t.metadata.snapshot_for_ref()
    n_files = len(plan_files(t.metadata, snap))
    assert n_files > 1  # range shuffle spread the write across tasks
    pruned = t.count_planned_files("id >= 10 and id < 50")
    assert pruned == 1, f"expected 1 of {n_files} files, planned {pruned}"
    assert t.scan("id >= 10 and id < 50").count() == 40


def test_writer_option_passthrough(engine, spark, tmp_path):
    t = engine.create_table(
        "ns.wopt",
        spark.createDataFrame([(0,)], "id long").schema,
        properties={"write.spark.option.parquet.bloom.filter.enabled#id": "true"},
    )
    t.append(spark.createDataFrame([(i,) for i in range(100)], "id long"))
    assert t.scan().count() == 100  # option accepted by the parquet writer


def test_rewrite_manifests_rebalances_metadata(engine, spark):
    """Many appends → many manifests; rewrite_manifests re-chunks them to
    sqrt-law size without touching data files or row visibility."""
    from iceberg_rust_custom_spark.metadata.manifest import read_manifest_list
    from iceberg_rust_custom_spark.table.maintenance import rewrite_manifests
    from iceberg_rust_custom_spark.table.scan import plan_files

    import os as _os
    import uuid as _uuid

    from iceberg_rust_custom_spark.metadata.manifest import (
        ManifestEntry,
        read_manifest,
        write_manifest,
        write_manifest_list,
    )
    from iceberg_rust_custom_spark.metadata.snapshot import Snapshot, SnapshotReference, generate_snapshot_id

    t = engine.create_table("ns.rm", spark.createDataFrame([(0,)], "id long").schema)
    for i in range(6):
        t.append(spark.createDataFrame([(i * 10 + j,) for j in range(5)], "id long").repartition(5))
    # manufacture imbalance (the shape a bulk import or degraded writer
    # leaves behind): one manifest per data file
    snap = t.metadata.snapshot_for_ref()
    entries = [
        ManifestEntry(1, e.snapshot_id, e.sequence_number, e.data_file)
        for r in read_manifest_list(snap.manifest_list)
        for e in read_manifest(r["manifest_path"])
        if e.status != 2
    ]
    meta_dir = _os.path.join(t.metadata.location, "metadata")
    rows = []
    for e in entries:
        path = _os.path.join(meta_dir, f"manifest-{_uuid.uuid4().hex[:12]}.parquet")
        rows.append(write_manifest(path, [e]))
    sid = generate_snapshot_id()
    ml = _os.path.join(meta_dir, f"snap-{sid}.manifest-list.parquet")
    write_manifest_list(ml, rows)
    frag = Snapshot(
        snapshot_id=sid,
        sequence_number=t.metadata.last_sequence_number + 1,
        timestamp_ms=snap.timestamp_ms + 1,
        manifest_list=ml,
        summary={"operation": "replace"},
        schema_id=t.metadata.current_schema_id,
        parent_snapshot_id=snap.snapshot_id,
    )
    tx = t.new_transaction()
    tx._extra_updates.append({"action": "add-snapshot", "snapshot": frag.to_dict()})
    tx._extra_updates.append(
        {"action": "set-snapshot-ref", "ref-name": "main", "reference": SnapshotReference(sid).to_dict()}
    )
    t.metadata = tx.commit()
    snap = t.metadata.snapshot_for_ref()
    data_before = sorted(f.file_path for f in plan_files(t.metadata, snap))
    n_manifests_before = len(read_manifest_list(snap.manifest_list))
    assert n_manifests_before == len(data_before)  # fully fragmented

    rewrite_manifests(t)
    snap2 = t.metadata.snapshot_for_ref()
    n_manifests_after = len(read_manifest_list(snap2.manifest_list))
    data_after = sorted(f.file_path for f in plan_files(t.metadata, snap2))
    assert data_after == data_before  # zero data movement
    assert n_manifests_after < n_manifests_before
    assert snap2.summary["operation"] == "replace"
    assert t.scan().count() == 30
    # metadata-only commit keeps incremental consumers valid
    seq = t.metadata.last_sequence_number
    t.append(spark.createDataFrame([(99,)], "id long"))
    assert {r.id for r in t.changes(seq).collect()} == {99}


def test_zorder_prunes_on_every_dimension(engine, spark):
    """After z-ordering on (x, y), a selective predicate on EITHER column
    plans a small fraction of files — lexicographic sort can only do this
    for its leading column."""
    import random

    from iceberg_rust_custom_spark.table.maintenance import zorder
    from iceberg_rust_custom_spark.table.scan import plan_files

    rng = random.Random(7)
    rows = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(20_000)]
    t = engine.create_table("ns.z", spark.createDataFrame([(0, 0)], "x long, y long").schema)
    t.append(spark.createDataFrame(rows, "x long, y long").repartition(8))

    zorder(t, ["x", "y"], target_file_size_bytes=15_000)
    n_files = len(plan_files(t.metadata, t.metadata.snapshot_for_ref()))
    assert n_files >= 4, f"need several files to demonstrate pruning, got {n_files}"
    px = t.count_planned_files("x >= 0 and x < 100")
    py = t.count_planned_files("y >= 0 and y < 100")
    assert px < n_files and py < n_files, (px, py, n_files)
    # correctness preserved
    assert t.scan().count() == 20_000
    assert t.scan("x < 100").count() == sum(1 for x, y in rows if x < 100)


def test_expire_honors_branch_retention(engine, spark):
    from iceberg_rust_custom_spark.metadata.snapshot import SnapshotReference
    from iceberg_rust_custom_spark.table.maintenance import expire_snapshots

    t = engine.create_table("ns.ret", spark.createDataFrame([(0,)], "id long").schema)
    for i in range(5):
        t.append(spark.createDataFrame([(i,)], "id long"))
    head = t.metadata.current_snapshot_id
    # main branch demands 3 ancestors kept
    t.metadata = (
        t.new_transaction()
        .set_ref("main", head)  # refresh ref with retention
        .commit()
    )
    refs = dict(t.metadata.refs)
    refs["main"] = SnapshotReference(head, "branch", min_snapshots_to_keep=3)
    t.metadata = t.metadata.__class__(**{**t.metadata.__dict__, "refs": refs})
    expire_snapshots(t, keep_last=1)
    chain = []
    sid = head
    while sid is not None and sid in t.metadata.snapshots:
        chain.append(sid)
        sid = t.metadata.snapshots[sid].parent_snapshot_id
    assert len(chain) >= 3  # retention protected the ancestry
    assert t.scan().count() == 5


def test_partitions_metadata_table(engine, spark):
    """Iceberg `partitions` metadata table: per-partition file/row rollup."""
    t = engine.create_table("ns.pmt", ORDERS_SCHEMA, partition_by=[("date", "month")])
    df = spark.createDataFrame(ROWS_BATCH1, "id long, customer_id long, product_id long, date date, amount int")
    t.append(df)
    parts = {r.partition: (r.file_count, r.record_count) for r in t.partitions().collect()}
    assert len(parts) == 2  # 2020-01 and 2020-02
    assert sum(rc for _, rc in parts.values()) == len(ROWS_BATCH1)
    assert all(fc >= 1 for fc, _ in parts.values())


def test_manifests_and_refs_metadata_tables(engine, spark):
    """Iceberg `manifests` / `refs` metadata tables."""
    t = engine.create_table("ns.mmt", ORDERS_SCHEMA, partition_by=[("date", "month")])
    df = spark.createDataFrame(ROWS_BATCH1, "id long, customer_id long, product_id long, date date, amount int")
    t.append(df)
    t.create_tag("v1")
    m = t.manifests().collect()
    assert len(m) >= 1
    assert sum(r.added_files_count for r in m) >= 1
    assert all(r.manifest_path for r in m)
    # partition FieldSummary bounds travel with each manifest row
    import json

    summaries = json.loads(m[0].partition_summaries)
    assert summaries and all({"lower", "upper"} <= set(v) for v in summaries.values())
    refs = {r.name: r for r in t.refs_df().collect()}
    assert refs["main"].type == "branch"
    assert refs["v1"].type == "tag"
    assert refs["v1"].snapshot_id == t.metadata.current_snapshot_id


@pytest.mark.slow
def test_bloom_filter_file_skipping(engine, spark):
    """Per-file bloom sketches prune `col = v` point lookups that min/max
    bounds cannot (interleaved keys make every file's range span the whole
    space), while never skipping a file that does contain the key."""
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    schema = Schema(
        0,
        (
            NestedField(1, "k", "long", True),
            NestedField(2, "name", "string", True),
        ),
    )
    t = engine.create_table(
        "ns.bloomed",
        schema,
        properties={
            "write.metadata.bloom-filter-columns": "k,name",
            "write.range-partitions": "4",
            "write.distribution-mode": "none",
        },
    )
    # two appends with interleaved key ranges: min/max overlap completely
    t.append(spark.createDataFrame([(i, f"u{i}") for i in range(0, 2000, 2)], "k long, name string"))
    t.append(spark.createDataFrame([(i, f"u{i}") for i in range(1, 2000, 2)], "k long, name string"))
    total = t.count_planned_files()
    assert total >= 2
    # every file's [min,max] contains 999 — only the bloom can skip here
    planned_hit = t.count_planned_files("k = 999")
    assert planned_hit < total
    assert t.scan("k = 999").count() == 1  # correctness: the key is found
    # absent key: bloom prunes everything (false positives possible but
    # vanishingly unlikely to hit all files)
    planned_miss = t.count_planned_files("k = 1000001")
    assert planned_miss < total
    assert t.scan("k = 1000001").count() == 0
    # string column probe: exact row survives, absent value prunes
    assert t.scan("name = 'u999'").count() == 1
    assert t.count_planned_files("name = 'zz_nobody'") < total
    # blooms survive the manifest round-trip
    from iceberg_rust_custom_spark.table.scan import plan_files

    snap = t.metadata.snapshot_for_ref()
    dfs = plan_files(t.metadata, snap, None)
    assert all(set(d.bloom_filters) == {"k", "name"} for d in dfs)


def test_wap_fast_forward(engine, spark):
    """Write-audit-publish: stage on a branch, validate, fast-forward main."""
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    schema = Schema(0, (NestedField(1, "id", "long", False),))
    t = engine.create_table("ns.wap", schema)
    t.append(spark.createDataFrame([(1,)], "id long"))
    t.create_branch("audit")
    t.append(spark.createDataFrame([(2,)], "id long"), branch="audit")
    # main unchanged while audit holds the new data
    assert t.scan().count() == 1
    assert t.scan(branch="audit").count() == 2
    t.fast_forward("audit")
    assert t.scan().count() == 2  # published

    # diverge: append to main, then audit is no longer a descendant
    t.append(spark.createDataFrame([(3,)], "id long"))
    with pytest.raises(ValueError, match="not a fast-forward"):
        t.fast_forward("audit")


def test_rollback_and_set_current_snapshot(engine, spark):
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    schema = Schema(0, (NestedField(1, "id", "long", False),))
    t = engine.create_table("ns.rollback", schema)
    t.append(spark.createDataFrame([(1,)], "id long"))
    s1 = t.metadata.snapshot_for_ref().snapshot_id
    t.append(spark.createDataFrame([(2,)], "id long"))
    t.append(spark.createDataFrame([(3,)], "id long"))
    s3 = t.metadata.snapshot_for_ref().snapshot_id
    assert t.scan().count() == 3

    t.rollback_to(s1)  # metadata-only: back to one row
    assert t.scan().count() == 1
    # abandoned snapshots stay readable by id, so the rollback is reversible
    assert t.scan(snapshot_id=s3).count() == 3
    t.set_current_snapshot(s3)
    assert t.scan().count() == 3

    # rolling back to a non-ancestor must be rejected
    t.create_branch("side", snapshot_id=s1)
    t.append(spark.createDataFrame([(99,)], "id long"), branch="side")
    side_head = t.metadata.refs["side"].snapshot_id
    with pytest.raises(ValueError, match="not an ancestor"):
        t.rollback_to(side_head)
    with pytest.raises(ValueError, match="no such snapshot"):
        t.rollback_to(123456789)

    # timestamp form: everything committed so far is <= now
    t.rollback_to(timestamp_ms=t.metadata.snapshots[s1].timestamp_ms)
    assert t.scan().count() == 1


def test_rollback_ddl(engine, spark):
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    schema = Schema(0, (NestedField(1, "id", "long", False),))
    t = engine.create_table("ns.rbddl", schema)
    t.append(spark.createDataFrame([(1,)], "id long"))
    v1 = t.metadata.snapshot_for_ref().snapshot_id
    t.append(spark.createDataFrame([(2,)], "id long"))
    v2 = t.metadata.snapshot_for_ref().snapshot_id
    engine.sql(f"ALTER TABLE ns.rbddl ROLLBACK TO VERSION {v1}")
    assert engine.load_table("ns.rbddl").scan().count() == 1
    engine.sql(f"ALTER TABLE ns.rbddl SET CURRENT VERSION {v2}")
    assert engine.load_table("ns.rbddl").scan().count() == 2


@pytest.mark.slow
def test_distributed_planning_matches_driver_walk(spark, tmp_path, sf_dir):
    """plan_files_distributed (the 100 TB mapInPandas planner) must return
    exactly the driver walk's file set for a spread of predicates, over a
    partitioned table with stats + a second spec (partition evolution)."""
    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.metadata.expressions import parse_predicate
    from iceberg_rust_custom_spark.table.scan import plan_files, plan_files_distributed

    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    eng.sql(
        "CREATE TABLE ns.dp (o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, "
        "o_orderdate TIMESTAMP) STORED AS ICEBERG PARTITIONED BY (month(o_orderdate))"
    )
    eng.insert("ns.dp", src.limit(800))
    t = eng.load_table("ns.dp")
    t.update_partition_spec("bucket(4, o_custkey)")
    eng.insert("ns.dp", src.limit(1000))
    t = eng.load_table("ns.dp")
    preds = [
        None,
        "o_orderdate >= TIMESTAMP '1997-06-01'",
        "o_orderdate >= TIMESTAMP '1997-06-01' AND o_totalprice > 100000",
        "o_custkey = 7",
        "o_orderkey IN (1, 2, 3)",
        "o_totalprice < 0",
    ]
    snap = t.metadata.snapshot_for_ref()
    for p in preds:
        expr = parse_predicate(p) if p else None
        a = sorted(f.file_path for f in plan_files(t.metadata, snap, expr))
        b = sorted(f.file_path for f in plan_files_distributed(spark, t.metadata, snap, expr))
        assert a == b, (p, len(a), len(b))
    # sanity: at least one predicate actually pruned
    full = len(plan_files(t.metadata, snap, None))
    pruned = len(plan_files(t.metadata, snap, parse_predicate(preds[1])))
    assert 0 < pruned < full
    # float upper-bound pruning must fire in BOTH paths (ADVICE r3: the
    # distributed decode dropped nan_value_counts, leaving nan_possible
    # unknown and disabling every >/>= prune on float columns)
    expr = parse_predicate("o_totalprice > 999999999.0")
    assert plan_files(t.metadata, snap, expr) == []
    assert plan_files_distributed(spark, t.metadata, snap, expr) == []


def test_planning_mode_property(spark, tmp_path):
    """read.planning-mode pins the planner: 'distributed' routes a tiny
    table through plan_files_distributed (same result set as the driver
    walk); 'driver'/'auto' keep the driver path."""
    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    sch = Schema(0, (NestedField(1, "id", "long", True),))
    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    t = eng.create_table(
        "pm.t", sch, properties={"read.planning-mode": "distributed"}
    )
    t.append(spark.createDataFrame([(i,) for i in range(10)], sch.spark_schema()))
    assert sorted(r.id for r in t.scan().collect()) == list(range(10))
    assert t.scan("id >= 5").count() == 5


def test_glue_catalog_connect_fallback():
    """GlueCatalog.connect() wires boto3.client('glue') when importable
    (a real botocore client object, no network needed to construct) and
    falls back to the in-process fake otherwise."""
    from iceberg_rust_custom_spark.catalog.glue_catalog import FakeGlueClient, GlueCatalog

    try:
        import boto3  # noqa: F401

        cat = GlueCatalog.connect(region_name="us-east-1")
        assert not isinstance(cat.client, FakeGlueClient)
        assert hasattr(cat.client, "get_table") and hasattr(cat.client, "update_table")
    except ImportError:
        cat = GlueCatalog.connect()
        assert isinstance(cat.client, FakeGlueClient)
    ident = Identifier.parse("ns.ct")
    cat2 = GlueCatalog(FakeGlueClient())
    cat2.register(ident, "/tmp/v0.json")
    assert cat2.load(ident)[0] == "/tmp/v0.json"


def test_all_files_and_all_manifests(engine, spark):
    t = engine.create_table("ns.allf", ORDERS_SCHEMA)
    t.append(_orders_df(spark, ROWS_BATCH1))
    t.create_branch("audit")
    # branch-only data: invisible to main's files(), visible in all_files()
    t.append(_orders_df(spark, ROWS_BATCH2), branch="audit")
    live = {r.file_path for r in t.files().collect()}
    allf = {r.file_path for r in t.all_files().collect()}
    assert live < allf, (live, allf)
    am = t.all_manifests()
    assert am.where("reference_snapshot_id IS NULL").count() == 0
    assert am.select("manifest_path").distinct().count() >= 2
    # SQL front door
    assert engine.sql("SELECT * FROM ns.allf.all_files").count() == len(allf)
    assert engine.sql("SELECT * FROM ns.allf.all_manifests").count() == am.count()


def test_zorder_numeric_view_is_dst_safe(spark):
    """ADVICE r10: the NTZ/date numeric view must be monotonic regardless
    of the session timezone. The old cast('timestamp') route mapped wall
    clock -> instant in the session tz: around a DST spring-forward gap,
    nonexistent local times shifted PAST later ones, misassigning Morton
    cells. The view is now built from date + time-of-day fields (tz-free)."""
    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.table.maintenance import _zorder_numeric_view

    wall = [  # strictly increasing wall clock crossing the 2024-03-10
        # US spring-forward gap (02:00-03:00 nonexistent in LA) and the
        # 2024-11-03 fall-back fold (01:30 ambiguous)
        dt.datetime(2024, 3, 10, 1, 30),
        dt.datetime(2024, 3, 10, 2, 15),
        dt.datetime(2024, 3, 10, 2, 45),
        dt.datetime(2024, 3, 10, 3, 30),
        dt.datetime(2024, 11, 3, 1, 0),
        dt.datetime(2024, 11, 3, 1, 30),
        dt.datetime(2024, 11, 3, 2, 30),
    ]
    old_tz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try:
        df = spark.createDataFrame([(w,) for w in wall], "ts timestamp_ntz")
        vals = [
            r.v
            for r in df.select(_zorder_numeric_view(df, "ts").alias("v"))
            .orderBy(F.col("ts"))
            .collect()
        ]
        assert vals == sorted(vals) and len(set(vals)) == len(vals), vals
        # date columns: same contract
        ddf = spark.createDataFrame(
            [(dt.date(2024, 3, 9),), (dt.date(2024, 3, 10),), (dt.date(2024, 3, 11),)],
            "d date",
        )
        dvals = [
            r.v for r in ddf.select(_zorder_numeric_view(ddf, "d").alias("v")).collect()
        ]
        assert dvals == sorted(dvals) and len(set(dvals)) == 3
    finally:
        spark.conf.set("spark.sql.session.timeZone", old_tz)
