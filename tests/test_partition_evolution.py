"""Partition evolution: spec changes apply to new writes only; scans decode
each manifest with the spec it was written under (the reference stores
partition_spec_id per manifest-list entry — manifest_list.rs:26-59 — and
models evolution as AddPartitionSpec/SetDefaultSpec commit updates,
catalog/commit.rs:303-317, but wires no API to it)."""

import datetime as dt

import pytest

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.metadata.manifest import read_manifest_list
from iceberg_rust_custom_spark.table.maintenance import compact
from iceberg_rust_custom_spark.table.scan import plan_files


def _mkdf(spark, year, n=6):
    rows = [
        (i + year * 100, dt.date(year, (i % 6) + 1, 10), float(i)) for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, d date, v double")


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path))


@pytest.fixture()
def evolved(eng, spark):
    eng.sql("CREATE TABLE ns.pe (id BIGINT, d DATE, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.pe")
    t.append(_mkdf(spark, 2020))  # unpartitioned (spec 0)
    t.update_partition_spec("month(d)")
    t.append(_mkdf(spark, 2021))  # spec 1: month(d)
    return t


def test_specs_registered_and_default_switched(evolved):
    md = evolved.metadata
    assert sorted(md.partition_specs) == [0, 1]
    assert md.default_spec_id == 1
    assert [f.name for f in md.default_spec().fields] == ["d_month"]


def test_manifests_record_their_spec(evolved):
    snap = evolved.metadata.snapshot_for_ref()
    spec_ids = {r["partition_spec_id"] for r in read_manifest_list(snap.manifest_list)}
    assert spec_ids == {0, 1}


def test_scan_reads_across_specs(evolved):
    assert evolved.scan().count() == 12
    # predicate correctness across the spec boundary
    assert evolved.scan("d >= '2021-01-01'").count() == 6


def test_pruning_exact_for_new_spec_conservative_for_old(evolved):
    t = evolved
    snap = t.metadata.snapshot_for_ref()
    all_files = plan_files(t.metadata, snap)
    # rows from 2021 live in month partitions; a one-month predicate must
    # plan fewer files than the full set but still include every old
    # (unpartitioned) file it cannot rule out by stats
    pruned = t.count_planned_files("d >= '2021-03-01' AND d < '2021-04-01'")
    assert pruned < len(all_files)
    assert t.scan("d >= '2021-03-01' AND d < '2021-04-01'").count() == 1


def test_compact_normalizes_to_current_spec(evolved):
    t = compact(evolved)
    snap = t.metadata.snapshot_for_ref()
    rows = read_manifest_list(snap.manifest_list)
    assert {r["partition_spec_id"] for r in rows} == {1}
    for f in plan_files(t.metadata, snap):
        assert set(f.partition) == {"d_month"}
    assert t.scan().count() == 12


def test_shared_field_keeps_id_and_name(eng, spark):
    eng.sql(
        "CREATE TABLE ns.pe2 (id BIGINT, d DATE, v DOUBLE) STORED AS ICEBERG "
        "PARTITIONED BY (month(d))"
    )
    t = eng.load_table("ns.pe2")
    old = t.metadata.default_spec().fields[0]
    t.update_partition_spec("month(d)", "bucket(4, id)")
    new = t.metadata.default_spec()
    kept = [f for f in new.fields if f.name == "d_month"][0]
    assert (kept.field_id, kept.source_id) == (old.field_id, old.source_id)
    added = [f for f in new.fields if f.name == "id_bucket"][0]
    assert added.field_id > old.field_id


def test_conflicting_name_auto_disambiguated(eng, spark):
    """A parameter-only evolution used to be rejected (name collision);
    now the new field gets a parameter-qualified name so partition tuples
    stay unambiguous across specs (ADVICE r4)."""
    eng.sql(
        "CREATE TABLE ns.pe3 (id BIGINT, d DATE) STORED AS ICEBERG "
        "PARTITIONED BY (bucket(4, id))"
    )
    t = eng.load_table("ns.pe3")
    t.update_partition_spec("bucket(8, id)")
    assert [f.name for f in t.metadata.default_spec().fields] == ["id_bucket_8"]
    old = t.metadata.partition_specs[0].fields[0]
    new = t.metadata.default_spec().fields[0]
    assert old.name == "id_bucket" and old.field_id != new.field_id


def test_append_after_evolution_merges_only_same_spec_manifests(evolved, spark):
    t = evolved
    t.append(_mkdf(spark, 2022))
    snap = t.metadata.snapshot_for_ref()
    for r in read_manifest_list(snap.manifest_list):
        # every manifest holds entries of exactly one spec
        assert r["partition_spec_id"] in (0, 1)
    assert t.scan().count() == 18


@pytest.mark.slow
def test_param_only_bucket_evolution_cow_rewrite(eng, spark):
    """bucket(4,id) -> bucket(8,id): both specs generate the field name
    'id_bucket', so key-set inference cannot tell them apart. A CoW
    rewrite that carries old-spec files must regroup them into manifests
    of THEIR spec via the threaded spec_id (ADVICE r4) — otherwise
    pruning decodes bucket[4] partition values with the bucket[8]
    transform and silently drops files on equality predicates."""
    from iceberg_rust_custom_spark.metadata.manifest import read_manifest
    from iceberg_rust_custom_spark.table.maintenance import delete_where

    eng.sql("CREATE TABLE ns.pb (id BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.pb")
    t.update_partition_spec("bucket(4, id)")
    t.append(_mkids(spark, 0, 20))
    t.update_partition_spec("bucket(8, id)")
    t.append(_mkids(spark, 20, 40))
    # the colliding base name is auto-disambiguated with the transform param
    assert [f.name for f in t.metadata.default_spec().fields] == ["id_bucket_8"]
    assert len(t.metadata.partition_specs) >= 3  # unpart + bucket4 + bucket8
    # planned files carry the spec they were written under (threaded from
    # the manifest-list row — the authoritative input to rewrite regrouping)
    snap0 = t.metadata.snapshot_for_ref()
    spec_ids = {f.spec_id for f in plan_files(t.metadata, snap0)}
    assert None not in spec_ids and len(spec_ids) == 2

    delete_where(t, "id = 25", mode="copy-on-write")
    t = eng.load_table("ns.pb")
    snap = t.metadata.snapshot_for_ref()
    # every manifest is spec-pure: carried files sit in a manifest of the
    # spec they were written under
    for row in read_manifest_list(snap.manifest_list):
        for e in read_manifest(row["manifest_path"], row):
            if e.data_file.spec_id is not None:
                assert e.data_file.spec_id == row["partition_spec_id"], e.data_file.file_path
    assert t.scan().count() == 39
    for probe in (3, 19, 21, 39):  # both sides of the evolution boundary
        assert t.scan(f"id = {probe}").count() == 1, probe


def _mkids(spark, lo, hi):
    return spark.createDataFrame([(i, float(i)) for i in range(lo, hi)], "id long, v double")


def test_partition_spec_string_two_arg_forms(eng, spark):
    """PartitionSpec.build's string shorthand accepts the two-arg DDL forms
    SHOW CREATE TABLE emits — and raises on garbage instead of silently
    treating 'bucket(4, id)' as an identity column name (ADVICE r4)."""
    import pytest as _pytest

    from iceberg_rust_custom_spark.metadata.partition import PartitionSpec

    eng.sql("CREATE TABLE ns.ps (id BIGINT, k STRING) STORED AS ICEBERG")
    schema = eng.load_table("ns.ps").metadata.current_schema()
    spec = PartitionSpec.build(schema, "bucket(4, id)", "truncate(2, k)")
    assert [(f.name, f.transform.name) for f in spec.fields] == [
        ("id_bucket", "bucket[4]"),
        ("k_truncate", "truncate[2]"),
    ]
    with _pytest.raises(ValueError, match="unrecognized partition spec"):
        PartitionSpec.build(schema, "bucket(id")
