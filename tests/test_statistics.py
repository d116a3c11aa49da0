"""Table statistics: incremental NDV via mergeable HLL blobs
(table/statistics.py). Invariants: estimates within HLL error of exact
distinct counts; incremental analyze (sketch only the delta, union blobs)
equals a from-scratch full analyze EXACTLY (same binary merge); entries
survive metadata round-trips and expire with their snapshots."""

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.table.statistics import analyze, latest_statistics


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def _mkdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 100).cast("int").alias("bucket"),
        F.concat(F.lit("u"), (F.col("id") % 1000).cast("string")).alias("user"),
        (F.col("id") % 7).cast("double").alias("score"),
    )


def test_analyze_ndv_accuracy_and_metadata(engine, spark):
    df = _mkdf(spark, 0, 5000)
    t = engine.create_table("ns.stats", df.schema)
    t.append(df)
    t.analyze()
    stats = {r.column: r.ndv for r in t.statistics_df().collect()}
    # HLL lgk=12 → ~2.7% standard error; allow 3σ
    for col, exact in [("id", 5000), ("bucket", 100), ("user", 1000), ("score", 7)]:
        assert abs(stats[col] - exact) <= max(3, exact * 0.09), (col, stats[col], exact)
    entry = latest_statistics(t)
    assert entry["snapshot-id"] == t.metadata.snapshot_for_ref().snapshot_id
    assert {b["type"] for b in entry["blob-metadata"]} == {"apache-datasketches-hll-v1"}
    # metadata JSON round-trip keeps the statistics
    md2 = type(t.metadata).from_json(t.metadata.to_json())
    assert md2.statistics == t.metadata.statistics


def test_incremental_analyze_equals_full(engine, spark):
    t = engine.create_table("ns.stats_inc", _mkdf(spark, 0, 1000).schema)
    t.append(_mkdf(spark, 0, 1000))
    t.analyze()
    first_path = latest_statistics(t)["statistics-path"]
    t.append(_mkdf(spark, 1000, 3000))
    t.analyze()  # appends-only → incremental: sketches only the 2000 new rows
    inc = {r.column: r.ndv for r in t.statistics_df().collect()}

    # from-scratch table over identical data, single analyze
    t2 = engine.create_table("ns.stats_full", _mkdf(spark, 0, 3000).schema)
    t2.append(_mkdf(spark, 0, 3000))
    t2.analyze()
    full = {r.column: r.ndv for r in t2.statistics_df().collect()}
    # sketch(A∪Δ) ≍ union(sketch(A), sketch(Δ)): same registers semantically,
    # but DataSketches reads a union through the composite estimator while a
    # single-pass sketch keeps its HIP estimator, so estimates differ <1% —
    # assert both land within HLL error of each other and of the exact count
    for col, exact in [("id", 3000), ("bucket", 100), ("user", 1000), ("score", 7)]:
        assert abs(inc[col] - full[col]) <= max(3, exact * 0.02), (col, inc[col], full[col])
        assert abs(inc[col] - exact) <= max(3, exact * 0.09), (col, inc[col], exact)
    assert latest_statistics(t)["statistics-path"] != first_path


def test_delete_in_range_forces_full_recompute(engine, spark):
    from iceberg_rust_custom_spark.table.maintenance import delete_where

    t = engine.create_table("ns.stats_del", _mkdf(spark, 0, 1000).schema)
    t.append(_mkdf(spark, 0, 1000))
    t.analyze()
    delete_where(t, "id >= 500")
    t.analyze()  # overwrite in range → full recompute, not blob merge
    stats = {r.column: r.ndv for r in t.statistics_df().collect()}
    assert abs(stats["id"] - 500) <= 500 * 0.09, stats["id"]


def test_expire_drops_statistics_entries(engine, spark):
    from iceberg_rust_custom_spark.table.maintenance import expire_snapshots

    t = engine.create_table("ns.stats_exp", _mkdf(spark, 0, 100).schema)
    t.append(_mkdf(spark, 0, 100))
    t.analyze()
    old_snap = t.metadata.snapshot_for_ref().snapshot_id
    t.append(_mkdf(spark, 100, 200))
    t.analyze()
    expire_snapshots(t, older_than_ms=2**62, keep_last=1)
    assert old_snap not in t.metadata.snapshots
    assert all(e["snapshot-id"] != old_snap for e in t.metadata.statistics)
    assert latest_statistics(t) is not None  # current snapshot's entry survives


def test_rollback_forces_full_recompute(engine, spark):
    """After a rollback, the analyzed snapshot is off the current ancestry —
    incremental blob reuse would count rows the table no longer holds."""
    t = engine.create_table("ns.stats_rb", _mkdf(spark, 0, 500).schema)
    t.append(_mkdf(spark, 0, 500))
    s1 = t.metadata.snapshot_for_ref().snapshot_id
    t.append(_mkdf(spark, 500, 2000))
    t.analyze(["id"])
    t.rollback_to(s1)
    t.analyze(["id"])
    stats = {r.column: r.ndv for r in t.statistics_df().collect()}
    assert abs(stats["id"] - 500) <= 500 * 0.09, stats["id"]  # not ~2000


def test_analyze_ddl(engine, spark):
    df = _mkdf(spark, 0, 500)
    engine.create_table("ns.stats_ddl", df.schema).append(df)
    out = engine.sql("ANALYZE TABLE ns.stats_ddl COMPUTE STATISTICS FOR COLUMNS id, bucket")
    got = {r.column: r.ndv for r in out.collect()}
    assert set(got) == {"id", "bucket"}
    assert abs(got["bucket"] - 100) <= 9


def test_stats_file_is_spec_correct_puffin(engine, spark):
    """ANALYZE writes a spec-correct Puffin container: magics, uncompressed
    footer JSON, per-column HLL blobs with field ids; sketches round-trip
    byte-identically and legacy parquet stats files still load."""
    from iceberg_rust_custom_spark.metadata.puffin import (
        HLL_BLOB_TYPE,
        MAGIC,
        read_puffin,
        write_puffin,
    )
    from iceberg_rust_custom_spark.table.statistics import (
        _load_sketches,
        analyze,
        latest_statistics,
    )

    engine.sql("CREATE TABLE ns.pf (id BIGINT, s STRING) STORED AS ICEBERG")
    t = engine.load_table("ns.pf")
    t.append(spark.createDataFrame([(i, f"v{i % 37}") for i in range(500)], "id long, s string"))
    analyze(t)
    entry = latest_statistics(t)
    path = entry["statistics-path"]
    assert path.endswith(".puffin")

    raw = open(path, "rb").read()
    assert raw[:4] == MAGIC and raw[-4:] == MAGIC
    meta, blobs = read_puffin(path)
    assert {b["type"] for b in meta["blobs"]} == {HLL_BLOB_TYPE}
    by_col = {b["properties"]["column"]: (b, data) for b, data in zip(meta["blobs"], blobs)}
    assert set(by_col) == {"id", "s"}
    schema = t.metadata.current_schema()
    for c, (b, data) in by_col.items():
        assert b["fields"] == [schema.field_by_name(c).field_id]
        assert b["snapshot-id"] == t.metadata.current_snapshot_id
        assert len(data) == b["length"] and len(data) > 0
    # loader round-trip matches the raw blobs
    assert dict(_load_sketches(path)) == {c: d for c, (_, d) in by_col.items()}
    # incremental analyze over a puffin base still merges (appends-only)
    t.append(spark.createDataFrame([(i, f"w{i}") for i in range(500, 600)], "id long, s string"))
    analyze(t)
    entry2 = latest_statistics(t)
    ndv_id = int(
        next(b for b in entry2["blob-metadata"] if b["fields"] == ["id"])["properties"]["ndv"]
    )
    assert 550 <= ndv_id <= 650  # ~600 distinct ids within HLL error
