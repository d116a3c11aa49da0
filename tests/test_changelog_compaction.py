"""r9: lineage-preserving rewrites (compact / zorder /
rewrite_position_deletes) are changelog-TRANSPARENT.

A compaction writes exactly the current scan output — zero net row change —
so ``Table.changes``, the streaming CDC source, and changelog-driven MV
maintenance split the range at the commit (``changelog_segments``) and
replay each side against the snapshot on that side, instead of dying
(changes/CDC) or falling back to a full refresh (MVs). At 100 TB
compaction is routine nightly maintenance; before this, every follower
stream died and every incremental MV paid a full recompute whenever
OPTIMIZE ran (VERDICT r8 top item)."""

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.streaming.cdc_source import register_cdc_source
from iceberg_rust_custom_spark.table.maintenance import (
    compact,
    delete_by_key,
    delete_where,
    rewrite_position_deletes,
    update_where,
    zorder,
)
from iceberg_rust_custom_spark.table.table import changelog_segments


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def _rows(spark, n=80, base=0):
    return spark.range(n).select(
        (F.col("id") + base).alias("k"),
        (F.col("id") % 5).alias("grp"),
        (F.col("id") * 2.0).alias("v"),
    )


def _key(df):
    return sorted(
        (r.k, r.grp, r.v, r._change_type)
        for r in df.select("k", "grp", "v", "_change_type").collect()
    )


def _mixed_history(eng, spark, name):
    t = eng.create_table(name, _rows(spark).schema)
    t.append(_rows(spark, 80))                                   # seq 1
    delete_where(t, "k % 9 = 0", mode="merge-on-read")           # seq 2
    update_where(t, {"v": "v + 100"}, "k % 7 = 3", mode="merge-on-read")  # seq 3
    delete_by_key(t, [5, 6], key_cols=["k"])                     # seq 4
    t.append(_rows(spark, 20, base=1000))                        # seq 5
    return t


@pytest.mark.slow
def test_changes_hash_match_across_mid_range_compact(eng, spark):
    """changes(0) before and after compact() are value-identical — the
    full MoR grammar (position deletes, MoR update, equality deletes,
    re-appends) replays from the pre-compaction snapshot segment."""
    t = _mixed_history(eng, spark, "c.t1")
    before = _key(t.changes(0))
    before_l = _key(t.changes(0, with_lineage=True))
    t = compact(t)
    assert _key(t.changes(0)) == before
    # update pairing (with_lineage) survives too: the paired
    # update_before/update_after labels replay from the old snapshots
    assert _key(t.changes(0, with_lineage=True)) == before_l
    assert any("update_before" == x[3] for x in before_l)
    # ops after the compaction extend the same continuous changelog
    delete_by_key(t, [50], key_cols=["k"])
    post = t.changes(0)
    assert (50,) in {(r.k,) for r in post.where("_change_type = 'delete'").collect()}


@pytest.mark.slow
def test_zorder_and_rewrite_position_deletes_transparent(eng, spark):
    t = _mixed_history(eng, spark, "c.t2")
    before = _key(t.changes(0))
    t = rewrite_position_deletes(t)  # tombstones → one DV container
    assert _key(t.changes(0)) == before
    t = zorder(t, ["k", "grp"])
    assert _key(t.changes(0)) == before


@pytest.mark.slow
def test_segments_split_shape(eng, spark):
    t = _mixed_history(eng, spark, "c.t3")
    t = compact(t)                       # seq 6
    t.append(_rows(spark, 5, base=2000))  # seq 7
    segs = changelog_segments(t.metadata, 0, t.metadata.last_sequence_number)
    assert [(lo, hi) for lo, hi, _ in segs] == [(0, 5), (6, 7)]
    # anchors: pre-compaction snapshot for the lower segment, head above
    assert segs[0][2].sequence_number == 5
    assert segs[1][2].sequence_number == 7


@pytest.mark.slow
def test_destructive_compact_still_refuses_below(eng, spark):
    """retain_history=False restores the reference's destructive rewrite:
    a range reaching below it raises (history is gone); a caught-up range
    across it replays (zero events), and post-compaction ops replay."""
    t = _mixed_history(eng, spark, "c.t4")
    caught_up = t.metadata.last_sequence_number
    t = compact(t, retain_history=False)
    with pytest.raises(ValueError, match="erased|expired"):
        t.changes(0).collect()
    assert t.changes(caught_up).count() == 0
    delete_by_key(t, [12], key_cols=["k"])
    post = t.changes(caught_up)
    assert [r.k for r in post.where("_change_type = 'delete'").collect()] == [12]


@pytest.mark.slow
def test_cow_rewrite_still_refuses(eng, spark):
    """A net-row-change rewrite (CoW delete) is NOT transparent."""
    t = _mixed_history(eng, spark, "c.t5")
    delete_where(t, "k = 2", mode="copy-on-write")
    with pytest.raises(ValueError, match="file-set replacement"):
        t.changes(0).collect()


@pytest.mark.slow
def test_cdc_stream_survives_compaction(eng, spark, tmp_path):
    """A checkpointed stream keeps following across a compaction: the next
    batch after compact emits exactly the post-checkpoint events, nothing
    re-delivered, nothing lost."""
    t = _mixed_history(eng, spark, "c.feed")
    fmt = register_cdc_source(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")

    def drain():
        q = (
            spark.readStream.format(fmt)
            .option("warehouse", eng.catalog.warehouse)
            .option("table", "c.feed")
            .load()
            .writeStream.format("parquet")
            .option("checkpointLocation", ckpt)
            .option("path", out)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()
    n0 = spark.read.parquet(out).count()
    assert n0 == _key(t.changes(0)).__len__()
    t = compact(t)
    delete_by_key(t, [33], key_cols=["k"])
    t.append(_rows(spark, 3, base=3000))
    drain()
    new = spark.read.parquet(out)
    assert new.count() == n0 + 4  # 1 delete + 3 inserts, nothing replayed
    assert new.where("_change_type = 'delete' AND k = 33").count() == 1


@pytest.mark.slow
def test_incremental_mv_survives_mid_range_compaction(eng, spark):
    """Changelog-driven MV maintenance keeps running incrementally across
    a source compaction (previously: forced full refresh). Content matches
    a from-scratch recompute."""
    t = eng.create_table("c.src", _rows(spark).schema)
    t.append(_rows(spark, 60))
    eng.create_materialized_view("c.mv", "SELECT k, v FROM c.src WHERE grp <> 4")
    # delta: MoR delete + compact + append, all since the last refresh
    delete_where(t, "k < 8", mode="merge-on-read")
    t = compact(t)
    t.append(_rows(spark, 10, base=500))
    ran = eng.refresh_materialized_view("c.mv")
    assert ran and ran != "full", ran
    got = sorted((r.k, r.v) for r in eng.scan_materialized_view("c.mv").collect())
    want = sorted((r.k, r.v) for r in eng.sql("SELECT k, v FROM c.src WHERE grp <> 4").collect())
    assert got == want


@pytest.mark.slow
def test_aggregate_mv_survives_compaction(eng, spark):
    t = eng.create_table("c.src2", _rows(spark).schema)
    t.append(_rows(spark, 60))
    eng.create_materialized_view(
        "c.mv2", "SELECT grp, sum(v) AS sv, count(k) AS n FROM c.src2 GROUP BY grp"
    )
    delete_by_key(t, [0, 1, 2], key_cols=["k"])
    t = compact(t)
    t.append(_rows(spark, 15, base=700))
    ran = eng.refresh_materialized_view("c.mv2")
    assert ran and ran != "full", ran
    got = sorted((r.grp, r.sv, r.n) for r in eng.scan_materialized_view("c.mv2").collect())
    want = sorted(
        (r.grp, r.sv, r.n)
        for r in eng.sql(
            "SELECT grp, sum(v) AS sv, count(k) AS n FROM c.src2 GROUP BY grp"
        ).collect()
    )
    assert got == want


@pytest.mark.slow
def test_range_end_below_a_later_compaction(eng, spark):
    """changes(0, mid) must replay against the state AT mid even when a
    compaction later rewrote everything — the anchor walks main's ancestry
    down to the last snapshot at or below the range end."""
    t = _mixed_history(eng, spark, "c.t6")  # seqs 1..5
    mid = 3
    before = _key(t.changes(0, mid))
    t = compact(t)                           # seq 6 rewrites every file
    t.append(_rows(spark, 4, base=4000))     # seq 7
    t = eng.load_table("c.t6")
    assert _key(t.changes(0, mid)) == before
    # and a range ending between compaction and head sees zero mid events
    assert t.changes(5, 6).count() == 0
