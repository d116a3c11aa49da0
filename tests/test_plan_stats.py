"""Plan-time statistics feed into join planning (reference:
datafusion_iceberg/src/statistics.rs:20-100): a scan whose post-MoR-delete
or post-predicate row estimate fits the broadcast threshold gets a
broadcast hint even though its raw parquet bytes exceed it."""

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


@pytest.fixture()
def small_threshold(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024))
    yield 64 * 1024
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _mkwide(spark, n):
    # ~100 bytes/row of incompressible-ish payload -> files well over 64 KB
    return spark.range(n).select(
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad1"),
        F.sha2((F.col("id") + 1).cast("string"), 256).alias("pad2"),
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_mor_deleted_dim_broadcasts(eng, spark, small_threshold):
    """Raw file bytes exceed the threshold, but after MoR-deleting ~99% of
    rows the estimate fits — the scan must carry a broadcast hint so the
    join is a BroadcastHashJoin, not SortMergeJoin."""
    from iceberg_rust_custom_spark.table.maintenance import delete_where

    eng.sql("CREATE TABLE ns.dim (id BIGINT, pad1 STRING, pad2 STRING) STORED AS ICEBERG")
    t = eng.load_table("ns.dim")
    t.append(_mkwide(spark, 5000))
    # raw bytes over threshold: the control join (no deletes) sort-merges
    fact = spark.range(100000).select(F.col("id"))
    raw_bytes = sum(
        f.file_size_in_bytes
        for f in __import__(
            "iceberg_rust_custom_spark.table.scan", fromlist=["plan_files"]
        ).plan_files(t.metadata, t.metadata.snapshot_for_ref())
    )
    assert raw_bytes > small_threshold
    control = fact.join(t.scan().select("id", "pad1"), "id")
    assert "BroadcastHashJoin" not in _plan(control)

    delete_where(t, "id >= 50", mode="merge-on-read")  # 4950 of 5000 rows tombstoned
    t = eng.load_table("ns.dim")
    assert t.scan().count() == 50
    joined = fact.join(t.scan().select("id", "pad1"), "id")
    assert "BroadcastHashJoin" in _plan(joined)
    # correctness unchanged by the hint
    assert joined.count() == 50


def test_selective_predicate_with_ndv_broadcasts(eng, spark, small_threshold):
    """After ANALYZE, an equality predicate's 1/NDV selectivity shrinks the
    estimate under the threshold although every file is planned (values
    interleave so min/max pruning keeps all files)."""
    from iceberg_rust_custom_spark.table.statistics import analyze

    eng.sql("CREATE TABLE ns.dw (id BIGINT, grp BIGINT, pad1 STRING, pad2 STRING) STORED AS ICEBERG")
    t = eng.load_table("ns.dw")
    df = _mkwide(spark, 5000).withColumn("grp", F.col("id") % 7).select("id", "grp", "pad1", "pad2")
    t.append(df)
    analyze(t, ["grp"])
    t = eng.load_table("ns.dw")

    fact = spark.range(100000).select(F.col("id"))
    control = fact.join(t.scan().select("id", "pad1"), "id")
    assert "BroadcastHashJoin" not in _plan(control)

    filtered = t.scan("grp = 3").select("id", "pad1")
    joined = fact.join(filtered, "id")
    assert "BroadcastHashJoin" in _plan(joined)
    assert joined.count() == t.scan("grp = 3").count()


def test_estimator_units():
    from iceberg_rust_custom_spark.metadata.expressions import parse_predicate
    from iceberg_rust_custom_spark.metadata.manifest import DataFile
    from iceberg_rust_custom_spark.table.plan_stats import estimate_scan, selectivity

    files = [
        DataFile(
            file_path=f"/f{i}",
            record_count=1000,
            file_size_in_bytes=100_000,
            lower_bounds={"v": 0},
            upper_bounds={"v": 100},
        )
        for i in range(4)
    ]
    # range interpolation over the [0, 100] envelope
    assert abs(selectivity(parse_predicate("v <= 25"), files, {}) - 0.25) < 1e-9
    # equality via NDV; AND multiplies
    assert abs(selectivity(parse_predicate("v = 5"), files, {"v": 50}) - 0.02) < 1e-9
    assert (
        abs(selectivity(parse_predicate("v = 5 AND v <= 25"), files, {"v": 50}) - 0.005)
        < 1e-9
    )
    # IN scales by set size; OR adds
    assert abs(selectivity(parse_predicate("v IN (1, 2, 3)"), files, {"v": 50}) - 0.06) < 1e-9
    est_rows, est_bytes, raw_bytes = estimate_scan(None, None, files, [], None)
    assert (est_rows, est_bytes, raw_bytes) == (4000, 400_000, 400_000)


def test_pruned_scan_scales_delete_subtraction():
    """Tombstones reference the whole table; a pruned scan must not absorb
    ALL of them (that falsely zeroes the estimate and broadcasts a big
    side). With total_data_rows supplied, subtraction scales by the
    planned fraction."""
    from iceberg_rust_custom_spark.metadata.manifest import DataFile, ManifestEntry
    from iceberg_rust_custom_spark.table.plan_stats import estimate_scan

    planned = [DataFile(file_path="/f0", record_count=1000, file_size_in_bytes=100_000)]
    deletes = [
        ManifestEntry(1, 1, 1, DataFile(file_path="/d0", record_count=5000, content=1))
    ]
    # unscaled (no total): clamps to zero
    rows, _, _ = estimate_scan(None, None, planned, deletes, None)
    assert rows == 0
    # scaled by planned fraction (1000 of 10000 data rows planned -> 500 deletes apply)
    rows, est_bytes, raw_bytes = estimate_scan(
        None, None, planned, deletes, None, total_data_rows=10_000
    )
    assert rows == 500 and est_bytes == 50_000 and raw_bytes == 100_000


def test_selectivity_properties():
    """Property: selectivity is always in [0, 1] and estimate_scan never
    exceeds raw, for arbitrary predicate trees over arbitrary file stats."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from iceberg_rust_custom_spark.metadata.expressions import (
        And,
        Comparison,
        IsNull,
        Not,
        Or,
    )
    from iceberg_rust_custom_spark.metadata.manifest import DataFile
    from iceberg_rust_custom_spark.table.plan_stats import estimate_scan, selectivity

    leaf = st.builds(
        Comparison,
        st.sampled_from(["a", "b"]),
        st.sampled_from(["=", "!=", "<", "<=", ">", ">=", "in"]),
        st.one_of(
            st.integers(-1000, 1000),
            st.tuples(st.integers(-10, 10), st.integers(-10, 10)),
        ),
    ) | st.builds(IsNull, st.sampled_from(["a", "b"]))
    tree = st.recursive(
        leaf,
        lambda kids: st.builds(And, kids, kids)
        | st.builds(Or, kids, kids)
        | st.builds(Not, kids),
        max_leaves=8,
    )
    files_st = st.lists(
        st.builds(
            lambda i, n, lo, hi, sz: DataFile(
                file_path=f"/f{i}",
                record_count=n,
                file_size_in_bytes=sz,
                lower_bounds={"a": min(lo, hi)},
                upper_bounds={"a": max(lo, hi)},
            ),
            st.integers(0, 5),
            st.integers(0, 10_000),
            st.integers(-100, 100),
            st.integers(-100, 100),
            st.integers(0, 10**9),
        ),
        min_size=0,
        max_size=5,
    )

    @settings(max_examples=200, deadline=None)
    @given(tree, files_st, st.one_of(st.none(), st.integers(1, 100)))
    def check(pred, files, ndv_a):
        ndv = {"a": ndv_a} if ndv_a else {}
        s = selectivity(pred, files, ndv)
        assert 0.0 <= s <= 1.0, (pred, s)
        est_rows, est_bytes, raw_bytes = estimate_scan(None, None, files, [], pred)
        assert 0 <= est_rows <= sum(f.record_count for f in files)
        assert 0 <= est_bytes <= raw_bytes

    check()


def test_ancestry_terminates_on_cycle_free_chains():
    """Property: ancestry() yields head->root exactly once per snapshot and
    stops at expired parents."""
    from iceberg_rust_custom_spark.metadata.snapshot import Snapshot, SnapshotReference
    from iceberg_rust_custom_spark.metadata.table_metadata import TableMetadata
    from iceberg_rust_custom_spark.metadata.partition import PartitionSpec
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    schema = Schema(0, (NestedField(1, "id", "long", True),))
    md = TableMetadata.new(location="/tmp/x", schema=schema, spec=PartitionSpec())
    prev = None
    for i in range(1, 6):
        md.snapshots[i] = Snapshot(
            snapshot_id=i, sequence_number=i, timestamp_ms=i, manifest_list="",
            summary={}, schema_id=0, parent_snapshot_id=prev,
        )
        prev = i
    md.refs["main"] = SnapshotReference(5)
    assert [s.snapshot_id for s in md.ancestry()] == [5, 4, 3, 2, 1]
    del md.snapshots[2]  # expire mid-chain: walk stops there
    assert [s.snapshot_id for s in md.ancestry()] == [5, 4, 3]
