"""MERGE upsert + stateful streaming operator + streaming table sink tests.
All beyond-reference features (the reference has no row-level ops and no
streaming; SURVEY.md §2.4, README.md:22-46)."""

import os

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.table.maintenance import merge_upsert


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def test_merge_upsert_updates_and_inserts(eng, spark):
    eng.sql("CREATE TABLE ns.m (id BIGINT, v STRING) STORED AS ICEBERG")
    t = eng.load_table("ns.m")
    t.append(spark.createDataFrame([(1, "old1"), (2, "old2"), (3, "old3")], "id long, v string"))
    src = spark.createDataFrame([(2, "new2"), (4, "new4")], "id long, v string")
    merge_upsert(t, src, ["id"])
    rows = {(r.id, r.v) for r in eng.load_table("ns.m").scan().collect()}
    assert rows == {(1, "old1"), (2, "new2"), (3, "old3"), (4, "new4")}


def test_merge_prunes_unmatched_files(eng, spark):
    """A file outside the source key range must carry over physically."""
    from iceberg_rust_custom_spark.table.scan import plan_files

    eng.sql("CREATE TABLE ns.mp (id BIGINT, v STRING) STORED AS ICEBERG")
    t = eng.load_table("ns.mp")
    t.append(spark.createDataFrame([(i, "lo") for i in range(10)], "id long, v string"))
    t.append(spark.createDataFrame([(i, "hi") for i in range(1000, 1010)], "id long, v string"))
    before = {f.file_path for f in plan_files(t.metadata, t.metadata.snapshot_for_ref())}
    merge_upsert(t, spark.createDataFrame([(1005, "merged")], "id long, v string"), ["id"])
    t = eng.load_table("ns.mp")
    after = {f.file_path for f in plan_files(t.metadata, t.metadata.snapshot_for_ref())}
    assert any(p in after for p in before), "low-range file should be untouched"
    got = {(r.id, r.v) for r in t.scan().where("id >= 1000").collect()}
    assert (1005, "merged") in got and len(got) == 10


def test_merge_empty_source_noop(eng, spark):
    eng.sql("CREATE TABLE ns.me (id BIGINT, v STRING) STORED AS ICEBERG")
    t = eng.load_table("ns.me")
    t.append(spark.createDataFrame([(1, "a")], "id long, v string"))
    snap_before = t.metadata.current_snapshot_id
    merge_upsert(t, spark.createDataFrame([], "id long, v string"), ["id"])
    assert t.metadata.current_snapshot_id == snap_before


@pytest.mark.slow
def test_stateful_dedup_stream_matches_batch(spark, tmp_path):
    """Streaming dedup (applyInPandasWithState) == batch dropDuplicates."""
    from iceberg_rust_custom_spark.streaming.stateful import dedup_stream

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    # two files → two micro-batches (maxFilesPerTrigger=1); duplicate ids
    # within and across batches
    spark.createDataFrame(
        [(1, 10, "a"), (2, 10, "b"), (3, 20, "c"), (1, 10, "dup-in-batch")],
        "event_id long, user_id long, payload string",
    ).coalesce(1).write.parquet(str(src_dir / "b1"))
    spark.createDataFrame(
        [(2, 10, "dup-across"), (4, 20, "d"), (5, 30, "e")],
        "event_id long, user_id long, payload string",
    ).coalesce(1).write.parquet(str(src_dir / "b2"))

    stream = (
        spark.readStream.schema("event_id long, user_id long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    out = dedup_stream(stream, key_col="user_id", id_col="event_id")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.sql("SELECT event_id FROM dedup_out").collect()
    assert sorted(r.event_id for r in got) == [1, 2, 3, 4, 5]


@pytest.mark.slow
def test_stream_append_to_table(eng, spark, tmp_path):
    """Streaming ingest into an engine table: foreachBatch append commits
    per micro-batch; final table content == source content."""
    from iceberg_rust_custom_spark.streaming.pipeline import stream_append_to_table

    eng.sql("CREATE TABLE ns.ing (id BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.ing")
    src_dir = tmp_path / "ingest_src"
    src_dir.mkdir()
    spark.createDataFrame([(i, float(i)) for i in range(50)], "id long, v double").write.parquet(
        str(src_dir / "p1")
    )
    spark.createDataFrame([(i, float(i)) for i in range(50, 80)], "id long, v double").write.parquet(
        str(src_dir / "p2")
    )
    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    q = stream_append_to_table(t, stream, str(tmp_path / "ckpt2"))
    q.awaitTermination(300)
    t = eng.load_table("ns.ing")
    assert t.scan().count() == 80
    assert len(t.metadata.snapshots) >= 2  # one commit per non-empty batch


@pytest.mark.slow
def test_maintain_compacts_after_small_appends(eng, spark):
    """Policy: many small files → one compaction; healthy table → no-op."""
    from iceberg_rust_custom_spark.table.maintenance import maintain
    from iceberg_rust_custom_spark.table.scan import plan_files

    eng.sql("CREATE TABLE ns.c (id BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.c")
    for i in range(10):
        t.append(spark.createDataFrame([(i, float(i))], "id long, v double"))
    n_before = len(plan_files(t.metadata, t.metadata.snapshot_for_ref()))
    assert n_before >= 10
    maintain(t, min_small_files=8)
    n_after = len(plan_files(t.metadata, t.metadata.snapshot_for_ref()))
    assert n_after < n_before
    assert t.scan().count() == 10
    snap = t.metadata.current_snapshot_id
    maintain(t, min_small_files=8)  # now healthy → no new snapshot
    assert t.metadata.current_snapshot_id == snap


@pytest.mark.slow
def test_stream_upsert_to_table(eng, spark, tmp_path):
    """CDC-style streaming upsert: later micro-batch records replace earlier
    rows with the same key (equality-delete + append per batch)."""
    from iceberg_rust_custom_spark.streaming.pipeline import stream_upsert_to_table

    eng.sql("CREATE TABLE ns.su (id BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.su")
    t.append(spark.createDataFrame([(i, 0.0) for i in range(10)], "id long, v double"))

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    spark.createDataFrame([(5, 55.0), (20, 20.0)], "id long, v double").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(src_dir / "b1"))
    stream = (
        spark.readStream.schema("id long, v double").parquet(str(src_dir) + "/*")
    )
    q = stream_upsert_to_table(t, stream, ["id"], str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    got = {r.id: r.v for r in eng.load_table("ns.su").scan().collect()}
    assert got[5] == 55.0 and got[20] == 20.0 and got[0] == 0.0
    assert len(got) == 11


def test_minhash_signature_columns_match_batch(spark):
    """The per-row signature expressions must equal the explode+groupBy
    batch pipeline value-for-value (same shingles, same hash family)."""
    from iceberg_rust_custom_spark.operators import dedup as D

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    batch = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(8))
             for r in D.minhash_signature(docs, "doc_id", "text", 8).collect()}
    rowwise = {r["doc_id"]: tuple(r[f"mh_{i}"] for i in range(8))
               for r in docs.select("doc_id", *D.minhash_signature_columns(F.col("text"), 8))
               .where(F.col("mh_0").isNotNull()).collect()}
    assert batch == rowwise and batch


@pytest.mark.slow
def test_neardup_stream_matches_batch(spark, tmp_path):
    """Streaming MinHash-LSH near-dup detection == batch minhash_lsh_pairs
    (as a pair SET; the stream emits per band collision, downstream
    dropDuplicates mirrors the batch .distinct())."""
    from iceberg_rust_custom_spark.operators import dedup as D
    from iceberg_rust_custom_spark.streaming.stateful import neardup_stream

    rows1 = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely different text about database storage engines"),
    ]
    rows2 = [
        (3, "the quick brown fox jumps over the lazy dog again and again"),  # dup of 1
        (4, "unrelated content mentioning spark parquet and arrow formats"),
        (5, "completely different text about database storage engines"),  # dup of 2
    ]
    src_dir = tmp_path / "nd_src"
    src_dir.mkdir()
    spark.createDataFrame(rows1, "doc_id long, text string").coalesce(1).write.parquet(
        str(src_dir / "b1")
    )
    spark.createDataFrame(rows2, "doc_id long, text string").coalesce(1).write.parquet(
        str(src_dir / "b2")
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    out = neardup_stream(stream, "doc_id", "text", num_hashes=16, bands=8)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("neardup_out")
        .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {(r.id_a, r.id_b) for r in spark.sql("SELECT * FROM neardup_out").collect()}
    batch = spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
    want = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(batch, "doc_id", "text", 16, 8, on_overflow="lazy").collect()
    }
    assert got == want
    assert (1, 3) in got and (2, 5) in got


def test_stream_append_replay_exactly_once(eng, spark, tmp_path):
    """foreachBatch is at-least-once: a crash after the table commit but
    before the checkpoint records the batch re-delivers the same batch_id
    on restart. The sink must skip it — drive the sink callable directly
    with a duplicate batch_id and assert no duplicate rows."""
    from iceberg_rust_custom_spark.streaming.pipeline import append_sink, last_committed_batch_id, _sink_id_for

    eng.sql("CREATE TABLE ns.eo (id BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.eo")
    ckpt = str(tmp_path / "ckpt_eo")
    sink = append_sink(t, ckpt)
    b0 = spark.createDataFrame([(i, float(i)) for i in range(10)], "id long, v double")
    b1 = spark.createDataFrame([(i, float(i)) for i in range(10, 15)], "id long, v double")

    sink(b0, 0)
    sink(b0, 0)  # replay of batch 0 (kill between commit and checkpoint)
    sink(b1, 1)
    sink(b1, 1)  # replay of batch 1
    sink(b0, 0)  # stale replay far behind the head

    t = eng.load_table("ns.eo")
    assert t.scan().count() == 15
    assert last_committed_batch_id(t, _sink_id_for(ckpt)) == 1
    # lineage is recorded in the snapshot summary of each streaming commit
    head = t.metadata.snapshot_for_ref()
    assert head.summary["streaming-batch-id"] == "1"


def test_stream_upsert_replay_exactly_once(eng, spark, tmp_path):
    """Upsert sink replay: the duplicate batch is skipped entirely (no
    redundant delete/append commits)."""
    from iceberg_rust_custom_spark.streaming.pipeline import upsert_sink

    eng.sql("CREATE TABLE ns.eu (id BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.eu")
    t.append(spark.createDataFrame([(i, 0.0) for i in range(5)], "id long, v double"))
    sink = upsert_sink(t, ["id"], str(tmp_path / "ckpt_eu"))
    b0 = spark.createDataFrame([(2, 22.0), (7, 77.0)], "id long, v double")
    sink(b0, 0)
    n_snaps = len(eng.load_table("ns.eu").metadata.snapshots)
    sink(b0, 0)  # replay: must not add any commit
    t = eng.load_table("ns.eu")
    assert len(t.metadata.snapshots) == n_snaps
    got = {r.id: r.v for r in t.scan().collect()}
    assert got == {0: 0.0, 1: 0.0, 2: 22.0, 3: 0.0, 4: 0.0, 7: 77.0}


@pytest.mark.slow
def test_stream_append_with_mv_maintenance(eng, spark, tmp_path):
    """r8: continuous MV maintenance — every micro-batch append refreshes
    the dependent GROUP BY MV incrementally (partial-aggregate merge, no
    recompute); final MV == recompute; MV discovery by table uuid."""
    from iceberg_rust_custom_spark.streaming.pipeline import (
        stream_append_with_mv_maintenance,
    )

    eng.sql("CREATE TABLE ns.live (id BIGINT, grp BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.live")
    t.append(spark.createDataFrame([(0, 0, 1.0)], "id long, grp long, v double"))
    eng.create_materialized_view(
        "ns.live_mv", "SELECT grp, COUNT(*) AS n, SUM(v) AS s FROM ns.live GROUP BY grp"
    )
    assert eng.dependent_materialized_views("ns.live") == ["ns.live_mv"]

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    for i, lo in enumerate((1, 41)):
        # coalesce like the other stream sources in this file: the default
        # 32-way write makes ~64 one-row micro-batches, whose fixed
        # per-batch cost can exceed awaitTermination's 300 s ceiling on a
        # slow box — 8 batches exercise the same multi-batch maintenance
        spark.createDataFrame(
            [(k, k % 3, float(k)) for k in range(lo, lo + 40)], "id long, grp long, v double"
        ).coalesce(4).write.parquet(str(src_dir / f"p{i}"))
    stream = (
        spark.readStream.schema("id long, grp long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    q = stream_append_with_mv_maintenance(eng, "ns.live", stream, str(tmp_path / "ck"))
    q.awaitTermination(300)

    got = {(r.grp, r.n, r.s) for r in eng.scan_materialized_view("ns.live_mv").collect()}
    want = {
        (r.grp, r.n, r.s)
        for r in eng.sql(
            "SELECT grp, COUNT(*) AS n, SUM(v) AS s FROM ns.live GROUP BY grp"
        ).collect()
    }
    assert got == want
    # the refreshes were incremental: storage history has a rewrite per
    # non-empty batch and its refresh-state tracks the source head
    storage = eng.load_table("ns.live_mv__storage")
    state = storage.metadata.snapshot_for_ref().summary["refresh-state"]
    src_t = eng.load_table("ns.live")
    assert state["source-table-states"] == {
        src_t.metadata.table_uuid: src_t.metadata.current_snapshot_id
    }


@pytest.mark.slow
def test_stream_upsert_with_mv_maintenance(eng, spark, tmp_path):
    """Streaming upserts (equality delete + append per batch) keep the MV
    fresh through the row-level changelog — replaced rows leave the MV."""
    from iceberg_rust_custom_spark.streaming.pipeline import (
        stream_upsert_with_mv_maintenance,
    )

    eng.sql("CREATE TABLE ns.ups (id BIGINT, v DOUBLE) STORED AS ICEBERG")
    t = eng.load_table("ns.ups")
    t.append(spark.createDataFrame([(i, 1.0) for i in range(10)], "id long, v double"))
    eng.create_materialized_view(
        "ns.ups_mv", "SELECT id, v FROM ns.ups WHERE v >= 1.0"
    )
    src_dir = tmp_path / "usrc"
    src_dir.mkdir()
    # batch 1 replaces ids 0-4 with v=2.0; batch 2 inserts ids 20-24 with 3.0
    spark.createDataFrame([(i, 2.0) for i in range(5)], "id long, v double").write.parquet(
        str(src_dir / "p0")
    )
    spark.createDataFrame([(i, 3.0) for i in range(20, 25)], "id long, v double").write.parquet(
        str(src_dir / "p1")
    )
    stream = (
        spark.readStream.schema("id long, v double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/*")
    )
    q = stream_upsert_with_mv_maintenance(eng, "ns.ups", stream, ["id"], str(tmp_path / "uck"))
    q.awaitTermination(300)

    got = {(r.id, r.v) for r in eng.scan_materialized_view("ns.ups_mv").collect()}
    want = {(i, 2.0) for i in range(5)} | {(i, 1.0) for i in range(5, 10)} | {
        (i, 3.0) for i in range(20, 25)
    }
    assert got == want
