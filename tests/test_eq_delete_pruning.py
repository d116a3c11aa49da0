"""r9: stats-pruned equality-delete victim discovery.

``delete_by_key`` harvests footer MIN/MAX bounds of its key columns into
the content=2 DataFile (VERDICT r8 item 8); the changelog, the streaming
CDC planner, CoW carried-delete materialization and position-delete
consolidation then skip data files whose key-column bounds provably cannot
intersect the delete's (VERDICT r8 weak #1: previously a 100-key delete on
a 100 TB table read EVERY strictly-older data file to find victims)."""

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.streaming.cdc_source import (
    IcebergChangelogStreamReader,
    register_cdc_source,
)
from iceberg_rust_custom_spark.table.maintenance import delete_by_key
from iceberg_rust_custom_spark.table.scan import (
    data_file_sequence_numbers,
    eq_delete_can_touch,
    eq_victim_candidates,
    plan_delete_files,
    plan_files,
)


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def t(eng, spark):
    """Ten files with disjoint key ranges: k in [0,100), [100,200), …"""
    import pyspark.sql.types as T
    t = eng.create_table(
        "p.t",
        T.StructType([T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]),
    )
    for i in range(10):
        t.append(
            spark.range(100).coalesce(1).select(
                (F.col("id") + i * 100).alias("k"), (F.col("id") * 1.0).alias("v")
            )
        )
    return t


def test_delete_by_key_records_key_bounds(eng, spark, t):
    delete_by_key(t, [250, 260], key_cols=["k"])
    md = t.metadata
    eqs = [
        e
        for e in plan_delete_files(md, md.snapshot_for_ref())
        if e.data_file.content == 2
    ]
    assert len(eqs) == 1
    d = eqs[0].data_file
    assert d.lower_bounds.get("k") == 250 and d.upper_bounds.get("k") == 260
    assert d.null_value_counts.get("k") == 0
    # visible through the files/entries metadata surface too
    row = (
        t.entries()
        .where("content = 2")
        .selectExpr("get_json_object(lower_bounds, '$.k') AS lo")
        .first()
    )
    assert row.lo == "250"


def test_victim_candidates_are_bounds_pruned(eng, spark, t):
    delete_by_key(t, [250, 260], key_cols=["k"])
    md = t.metadata
    snap = md.snapshot_for_ref()
    eqs = [e for e in plan_delete_files(md, snap) if e.data_file.content == 2]
    files = plan_files(md, snap)
    seqs = data_file_sequence_numbers(md, snap)
    cand = eq_victim_candidates(files, eqs, md.current_schema(), seqs)
    # only the [200,300) file intersects [250,260]
    assert len(files) == 10 and len(cand) == 1
    assert cand[0].lower_bounds["k"] == 200


@pytest.mark.slow
def test_cdc_planner_prunes_victim_partitions(eng, spark, t):
    delete_by_key(t, [250, 260], key_cols=["k"])
    r = IcebergChangelogStreamReader(
        {"warehouse": eng.catalog.warehouse, "table": "p.t"}
    )
    parts = r.partitions({"seq": 0}, {"seq": t.metadata.last_sequence_number})
    victims = [p for p in parts if p.eq_victims]
    assert len(victims) == 1  # not 10
    # and the feed still emits exactly the two victims
    fmt = register_cdc_source(spark)
    feed = (
        spark.read.format(fmt)
        .option("warehouse", eng.catalog.warehouse)
        .option("table", "p.t")
        .load()
    )
    assert sorted(
        x.k for x in feed.where("_change_type = 'delete'").collect()
    ) == [250, 260]
    want = t.changes(0).select(*[c for c in feed.columns if c != "_commit_seq"])
    got = feed.drop("_commit_seq")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_null_keys_disable_pruning_but_stay_correct(eng, spark, t):
    """A delete key set containing NULL must not be bounds-pruned away —
    NULL matches NULL (eqNullSafe, the scan contract)."""
    t.append(spark.createDataFrame([(None, 0.0)], "k long, v double"))
    keys = spark.createDataFrame([(None,)], "k long")
    delete_by_key(t, keys)
    md = t.metadata
    snap = md.snapshot_for_ref()
    eqs = [e for e in plan_delete_files(md, snap) if e.data_file.content == 2]
    files = plan_files(md, snap)
    cand = eq_victim_candidates(
        files, eqs, md.current_schema(), data_file_sequence_numbers(md, snap)
    )
    # the NULL-bearing file must remain a candidate (bounds say nothing
    # about NULLs); pure-non-null files prune via their zero null counts
    assert any(f.null_value_counts.get("k", 1) != 0 or f.record_count == 1 for f in cand)
    dels = t.changes(0).where("_change_type = 'delete'")
    assert dels.count() == 1 and dels.first().k is None
    # the scan agrees: the NULL row is gone
    assert t.scan().where("k IS NULL").count() == 0


def test_can_touch_units():
    from iceberg_rust_custom_spark.metadata.manifest import DataFile
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    schema = Schema(fields=(NestedField(1, "k", "long"), NestedField(2, "s", "string")))
    data = DataFile(
        "f", lower_bounds={"k": 0, "s": "a"}, upper_bounds={"k": 99, "s": "m"},
        null_value_counts={"k": 0, "s": 0},
    )
    mk = lambda lo, hi, ids=(1,), nulls=0: DataFile(
        "d", content=2, equality_ids=list(ids),
        lower_bounds={"k": lo, "s": "x"}, upper_bounds={"k": hi, "s": "z"},
        null_value_counts={"k": nulls, "s": 0},
    )
    assert eq_delete_can_touch(data, mk(50, 60), schema)          # overlap
    assert not eq_delete_can_touch(data, mk(200, 300), schema)    # disjoint
    assert not eq_delete_can_touch(data, mk(50, 60, ids=(1, 2)), schema)  # s disjoint
    assert eq_delete_can_touch(data, mk(200, 300, nulls=1), schema) is False  # data null-free
    nullable = DataFile("f2", lower_bounds={"k": 0}, upper_bounds={"k": 9},
                        null_value_counts={"k": 3})
    assert eq_delete_can_touch(nullable, mk(200, 300, nulls=1), schema)  # null↔null
    nobounds = DataFile("f3")
    assert eq_delete_can_touch(nobounds, mk(200, 300), schema)    # conservative


def test_rename_reuse_does_not_misbind_bounds(eng, spark):
    """Review r9: after rename x→y frees a name that a NEW field (with a
    default) reuses, an old file's footer stats for the renamed-away
    column must not be read as the new key column's range — that wrongly
    pruned files the scan DOES delete from, making the changelog diverge
    from the scan."""
    import pyspark.sql.types as T

    t = eng.create_table(
        "p.rn",
        T.StructType([T.StructField("x", T.LongType()), T.StructField("v", T.DoubleType())]),
    )
    t.append(spark.range(10).coalesce(1).select(F.col("id").alias("x"), F.lit(1.0).alias("v")))
    t.update_schema().rename_column("x", "y").commit()
    t.update_schema().add_column("x", "long", default=100).commit()
    # delete on the NEW x: old rows logically hold the default 100 → all die
    keys = spark.createDataFrame([(100,)], "x long")
    delete_by_key(t, keys)
    assert t.scan().count() == 0  # the scan applies the delete
    dels = t.changes(0).where("_change_type = 'delete'")
    assert dels.count() == 10  # the changelog agrees (no wrong prune)
    # CDC feed too
    r = IcebergChangelogStreamReader({"warehouse": eng.catalog.warehouse, "table": "p.rn"})
    parts = r.partitions({"seq": 0}, {"seq": t.metadata.last_sequence_number})
    assert any(p.eq_victims for p in parts)


def test_large_delete_key_set_is_not_funneled(eng, spark):
    """r10 (VERDICT r9 weak #1): a Δ⁻ past write.eq-delete.target-rows must
    NOT coalesce(1) through a single task — it range-partitions on the key
    columns and emits one content=2 DataFile per part, each with its own
    (disjoint) footer bounds so victim planning prunes per file."""
    import pyspark.sql.types as T

    t = eng.create_table(
        "p.big",
        T.StructType(
            [T.StructField("k", T.LongType()), T.StructField("v", T.DoubleType())]
        ),
        properties={"write.eq-delete.target-rows": "100"},
    )
    t.append(
        spark.range(1000).coalesce(1).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
        )
    )
    t = delete_by_key(t, list(range(0, 500)), key_cols=["k"])
    md = t.metadata
    eqs = [
        e
        for e in plan_delete_files(md, md.snapshot_for_ref())
        if e.data_file.content == 2
    ]
    assert len(eqs) >= 2  # 500 keys / 100 target → ~5 parts
    ranges = sorted(
        (e.data_file.lower_bounds["k"], e.data_file.upper_bounds["k"]) for e in eqs
    )
    # range partitioning → disjoint, ordered per-file key ranges
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2
    assert ranges[0][0] == 0 and ranges[-1][1] == 499
    assert sum(e.data_file.record_count for e in eqs) == 500
    # correctness unchanged
    assert sorted(r.k for r in t.scan().collect()) == list(range(500, 1000))
    dels = t.changes(0).where("_change_type='delete'").count()
    assert dels == 500


def test_small_delete_key_set_stays_one_file(eng, spark, t):
    """The common case (tiny Δ⁻) must still produce exactly one delete file
    — no 32-way fan-out of 2-row parquet files per MV refresh."""
    t2 = delete_by_key(t, [5, 905], key_cols=["k"])
    eqs = [
        e
        for e in plan_delete_files(t2.metadata, t2.metadata.snapshot_for_ref())
        if e.data_file.content == 2
    ]
    assert len(eqs) == 1


def test_scan_skips_nonintersecting_eq_deletes(eng, spark, t):
    """r10: scan-side application also bounds-prunes — a predicate-pruned
    scan whose planned files are all provably disjoint from a delete's key
    bounds pays NO eq-delete anti-join at all (point lookups on MoR tables
    previously joined every live tombstone)."""
    t2 = delete_by_key(t, [250, 260], key_cols=["k"])
    # scan restricted to the [500,600) file: delete bounds [250,260] are
    # provably disjoint — the plan must carry no eq-delete join columns
    df = t2.scan("k >= 500 AND k < 600")
    plan = df._jdf.queryExecution().analyzed().toString()
    assert "_sg_k_" not in plan and "_sg_eseq" not in plan
    assert df.count() == 100
    # a scan covering the victim range still applies the delete
    hit = t2.scan("k >= 200 AND k < 300")
    assert hit.count() == 98
    assert "_sg_eseq" in hit._jdf.queryExecution().analyzed().toString()
