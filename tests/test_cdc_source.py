"""Streaming CDC source (streaming/cdc_source.py): the table's commit log
as a Structured Streaming source via the PySpark 4 Python DataSource API.
The batch flavor must value-match ``Table.changes`` (the already
oracle-verified changelog); the stream flavor must checkpoint-resume with
exactly-once delivery."""

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.streaming.cdc_source import (
    IcebergChangelogStreamReader,
    register_cdc_source,
)
from iceberg_rust_custom_spark.table.maintenance import (
    delete_by_key,
    delete_where,
    update_where,
)


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def _orders(spark, n=400):
    return (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("grp"),
            (F.col("id") * 10).cast("double").alias("amt"),
        )
    )


def _feed(spark, engine, table):
    fmt = register_cdc_source(spark)
    return (
        spark.read.format(fmt)
        .option("warehouse", engine.catalog.warehouse)
        .option("table", table)
        .load()
    )


def test_batch_feed_matches_table_changes(spark, engine):
    """Inserts + MoR position deletes (parquet or DV) + MoR update replay
    identically to Table.changes(0)."""
    t = engine.create_table("s.t", _orders(spark).schema)
    t.append(_orders(spark))
    delete_where(t, "k % 5 = 0", mode="merge-on-read")
    update_where(t, {"amt": "amt + 1"}, "k % 11 = 3", mode="merge-on-read")
    t.append(_orders(spark).where("k < 20").withColumn("k", F.col("k") + 1000))

    feed = _feed(spark, engine, "s.t").drop("_commit_seq")
    want = t.changes(0).select(*feed.columns)
    assert feed.exceptAll(want).count() == 0
    assert want.exceptAll(feed).count() == 0


def test_commit_seq_attribution_and_pre_range_suppression(spark, engine):
    """_commit_seq carries the killing/inserting commit; a second delete of
    an already-dead row emits nothing (pre-range suppression)."""
    t = engine.create_table("s.a", _orders(spark).schema)
    t.append(_orders(spark, 100))  # seq 1
    delete_where(t, "k < 10", mode="merge-on-read")  # seq 2
    anchor = t.metadata.last_sequence_number
    delete_where(t, "k < 20", mode="merge-on-read")  # seq 3: 10 already dead

    fmt = register_cdc_source(spark)
    feed = (
        spark.read.format(fmt)
        .option("warehouse", engine.catalog.warehouse)
        .option("table", "s.a")
        .option("starting_sequence", str(anchor))
        .load()
    )
    rows = feed.collect()
    assert {r._change_type for r in rows} == {"delete"}
    assert sorted(r.k for r in rows) == list(range(10, 20))
    assert {r._commit_seq for r in rows} == {anchor + 1}


def test_added_column_reads_null_for_old_files(spark, engine):
    t = engine.create_table("s.e", _orders(spark).schema)
    t.append(_orders(spark, 50))
    t.update_schema().add_column("note", "string").commit()
    t.append(
        _orders(spark, 10)
        .withColumn("k", F.col("k") + 100)
        .withColumn("note", F.lit("new"))
    )
    feed = _feed(spark, engine, "s.e")
    assert feed.where("note IS NULL").count() == 50
    assert feed.where("note = 'new'").count() == 10


def test_refusals_are_loud_not_wrong(spark, engine):
    """CoW file-set replacement and equality deletes refuse instead of
    emitting a wrong changelog (same posture as Table.changes on
    replacements)."""
    t = engine.create_table("s.r", _orders(spark).schema)
    t.append(_orders(spark, 60))
    delete_where(t, "k = 1", mode="copy-on-write")
    with pytest.raises(Exception, match="file-set replacement"):
        _feed(spark, engine, "s.r").collect()

    t2 = engine.create_table("s.q", _orders(spark).schema)
    t2.append(_orders(spark, 60))
    delete_by_key(t2, [3, 4], key_cols=["k"])
    with pytest.raises(Exception, match="[Ee]quality delete"):
        _feed(spark, engine, "s.q").collect()


def test_position_chunking_preserves_results(spark, engine):
    """A tiny max_positions_per_partition splits delete reads into many
    partitions without changing the result set."""
    t = engine.create_table("s.c", _orders(spark).schema)
    t.append(_orders(spark, 300))
    delete_where(t, "k % 2 = 0", mode="merge-on-read")

    reader = IcebergChangelogStreamReader(
        {
            "warehouse": engine.catalog.warehouse,
            "table": "s.c",
            "max_positions_per_partition": "10",
        }
    )
    parts = reader.partitions({"seq": 0}, reader.latestOffset())
    del_parts = [p for p in parts if p.change_type == "delete"]
    assert len(del_parts) > 5  # 150 positions / 10 per chunk, per file
    assert all(len(p.positions) <= 10 for p in del_parts)

    fmt = register_cdc_source(spark)
    feed = (
        spark.read.format(fmt)
        .option("warehouse", engine.catalog.warehouse)
        .option("table", "s.c")
        .option("max_positions_per_partition", "10")
        .load()
    )
    got = sorted(r.k for r in feed.where("_change_type = 'delete'").collect())
    assert got == list(range(0, 300, 2))


def test_stream_resume_exactly_once(spark, engine, tmp_path):
    """availableNow → parquet sink; a second run after a new commit ships
    ONLY the delta (offsets from the checkpoint), no duplicates."""
    t = engine.create_table("s.s", _orders(spark).schema)
    t.append(_orders(spark, 200))
    delete_where(t, "k < 5", mode="merge-on-read")
    fmt = register_cdc_source(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run():
        q = (
            spark.readStream.format(fmt)
            .option("warehouse", engine.catalog.warehouse)
            .option("table", "s.s")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(180)

    run()
    assert spark.read.parquet(out).count() == 205
    t.append(_orders(spark, 30).withColumn("k", F.col("k") + 500))
    run()
    df = spark.read.parquet(out)
    assert df.count() == 235
    # exactly-once: every (k, _change_type) appears exactly once
    assert (
        df.groupBy("k", "_change_type").count().where("count > 1").count() == 0
    )


def test_added_column_with_default_reads_initial_default(spark, engine):
    """v3 default values: a column added with DEFAULT reads the add-time
    initial-default from pre-existing files, matching the batch scan."""
    t = engine.create_table("s.d", _orders(spark).schema)
    t.append(_orders(spark, 40))
    t.update_schema().add_column("src", "string", default="bulk").commit()
    t.append(
        _orders(spark, 5)
        .withColumn("k", F.col("k") + 100)
        .withColumn("src", F.lit("live"))
    )
    feed = _feed(spark, engine, "s.d")
    assert feed.where("src = 'bulk'").count() == 40
    assert feed.where("src = 'live'").count() == 5


def test_max_commits_per_batch_offset_pacing(spark, engine):
    """Admission control (continuous triggers): after a fresh
    initialOffset, successive latestOffset calls advance one commit at a
    time up to the head and never beyond; without a prior initialOffset
    (checkpoint restart) the first call is uncapped so the checkpointed
    offset can never regress."""
    t = engine.create_table("s.mc", _orders(spark).schema)
    for lo in (0, 100, 200):
        t.append(_orders(spark, 10).withColumn("k", F.col("k") + lo))
    opts = {
        "warehouse": engine.catalog.warehouse,
        "table": "s.mc",
        "max_commits_per_batch": "1",
    }
    r = IcebergChangelogStreamReader(opts)
    assert r.initialOffset() == {"seq": 0}
    assert [r.latestOffset()["seq"] for _ in range(5)] == [1, 2, 3, 3, 3]
    # restart shape: no initialOffset → first latestOffset = head, uncapped
    r2 = IcebergChangelogStreamReader(opts)
    assert r2.latestOffset()["seq"] == 3
    # each paced batch carries exactly its commit's rows
    parts = r2.partitions({"seq": 1}, {"seq": 2})
    assert all(p.change_type == "insert" for p in parts)
    total = sum(1 for _ in parts)
    assert total >= 1


def test_table_changes_sql_tvf(spark, engine):
    """SQL spelling of ranged CDC: table_changes('ns.t', from[, to]) in
    engine.sql resolves to Table.changes over that range."""
    t = engine.create_table("s.tc", _orders(spark).schema)
    t.append(_orders(spark, 50))
    anchor = t.metadata.last_sequence_number
    delete_where(t, "k < 5", mode="merge-on-read")
    t.append(_orders(spark, 5).withColumn("k", F.col("k") + 900))

    df = engine.sql(
        f"SELECT _change_type, COUNT(*) AS n FROM table_changes('s.tc', {anchor}) "
        "GROUP BY _change_type"
    )
    got = {(r._change_type, r.n) for r in df.collect()}
    assert got == {("delete", 5), ("insert", 5)}
    # bounded range: only the delete commit
    df2 = engine.sql(
        f"SELECT COUNT(*) AS n FROM table_changes('s.tc', {anchor}, {anchor + 1})"
    )
    assert df2.collect()[0].n == 5
