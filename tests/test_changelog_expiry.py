"""r10: the changelog's expiry and branch-ancestry contracts.

1. VERDICT r9 missing #3: expiring source snapshots past a follower's
   checkpointed offset must make the next read FAIL LOUDLY (the resync
   error) — never silently skip the erased events. An expired in-range
   commit could have been a rewrite whose pre-image files are gone; the
   planner cannot know, so it refuses.
2. ADVICE r9 #1: only snapshots on the ref's own ancestry participate in
   ``changelog_segments`` — a lineage-preserved rewrite committed on a
   NON-MAIN branch previously split the range and re-anchored segments at
   its off-ancestry parent, silently dropping main-branch events.
"""

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.streaming.cdc_source import register_cdc_source
from iceberg_rust_custom_spark.table.maintenance import delete_where, expire_snapshots
from iceberg_rust_custom_spark.table.table import changelog_segments


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


def _rows(spark, n=20, base=0):
    return spark.range(n).select(
        (F.col("id") + base).alias("k"), (F.col("id") * 1.0).alias("v")
    )


@pytest.mark.slow
def test_append_only_expiry_keeps_full_replay(eng, spark):
    """r10 replay floor: expiry of plain appends/MoR deletes loses NOTHING
    (their files keep their sequence numbers in surviving manifests) —
    expire_snapshots records changelog.replay-floor so a follower's
    changes(0) still replays every event exactly."""
    t = eng.create_table("e.t", _rows(spark).schema)
    for i in range(5):
        t.append(_rows(spark, 10, base=i * 100))
    delete_where(t, "k = 100", mode="merge-on-read")
    t = expire_snapshots(t, keep_last=2)
    assert len(t.metadata.snapshots) == 2
    assert t.metadata.properties.get("changelog.replay-floor") == "0"
    got = t.changes(0)
    assert got.where("_change_type = 'insert'").count() == 50
    assert [r.k for r in got.where("_change_type = 'delete'").collect()] == [100]


def test_expiry_past_rewrite_fails_loudly(eng, spark):
    """A removed REWRITE raises the replay floor: ranges reaching below it
    refuse with a resync hint (pre-image files may be gone); ranges at or
    above the floor replay."""
    from iceberg_rust_custom_spark.table.maintenance import compact

    t = eng.create_table("e.tr", _rows(spark).schema)
    t.append(_rows(spark, 10))
    t.append(_rows(spark, 10, base=100))
    t = compact(t)
    floor_seq = t.metadata.snapshot_for_ref().sequence_number
    t.append(_rows(spark, 10, base=200))
    t = expire_snapshots(t, keep_last=1)  # removes both appends AND the compact
    assert t.metadata.properties.get("changelog.replay-floor") == str(floor_seq)
    with pytest.raises(ValueError, match="expired|erased"):
        t.changes(0)
    # at the floor: the post-compact append replays
    assert t.changes(floor_seq).count() == 10
    # the streaming feed surfaces the same refusal with the resync hint
    fmt = register_cdc_source(spark)
    feed = (
        spark.read.format(fmt)
        .option("warehouse", eng.catalog.warehouse)
        .option("table", "e.tr")
        .load()
    )
    with pytest.raises(Exception, match="expired|erased|fresh stream"):
        feed.collect()


def test_changes_within_retained_window_still_replay(eng, spark):
    """A follower whose offset is at (or above) the oldest retained
    ancestor's predecessor keeps working after expiry."""
    t = eng.create_table("e.t2", _rows(spark).schema)
    for i in range(5):
        t.append(_rows(spark, 10, base=i * 100))
    delete_where(t, "k = 400", mode="merge-on-read")  # seq 6
    expire_snapshots(t, keep_last=3)
    oldest = min(s.sequence_number for s in t.metadata.snapshots.values())
    got = t.changes(oldest - 1)
    # keep_last=3 retains seqs 4..6: two appends (20 inserts) + the delete
    assert got.where("_change_type = 'insert'").count() == 20
    assert got.where("_change_type = 'delete'").count() == 1


def test_branch_rewrite_does_not_drop_main_events(eng, spark):
    """ADVICE r9 #1: a lineage-preserved rewrite on a side branch must not
    split/re-anchor the MAIN changelog (previously it anchored a segment at
    its off-ancestry parent — main events past the branch point vanished)."""
    t = eng.create_table("e.b", _rows(spark).schema)
    t.append(_rows(spark, 10))            # main seq 1
    t.append(_rows(spark, 10, base=100))  # main seq 2
    # a transparent-rewrite-shaped commit on a branch forked from head;
    # its parent is main seq 2, but a branch rewrite at seq 3 with parent
    # seq 1 is the advice's exact shape — fork the branch at seq 1 first
    head = t.metadata.snapshot_for_ref()
    first = next(
        s for s in t.metadata.snapshots.values() if s.sequence_number == 1
    )
    t.metadata = (
        t.new_transaction().set_ref("dev", first.snapshot_id).commit()
    )
    t.append(
        _rows(spark, 5, base=500),
        branch="dev",
        summary={"rewritten": "true", "lineage-preserved": "true"},
    )  # seq 3, parent = seq 1, off-main
    md = t.metadata
    assert md.snapshot_for_ref().snapshot_id == head.snapshot_id  # main intact
    segs = changelog_segments(md, 0, md.last_sequence_number)
    # ONE segment covering everything, anchored on main's head
    assert len(segs) == 1
    lo, hi, anchor = segs[0]
    assert (lo, hi) == (0, md.last_sequence_number)
    assert anchor.snapshot_id == head.snapshot_id
    # and the changelog carries BOTH main appends (20 inserts)
    assert t.changes(0).count() == 20


def test_branch_cow_replacement_does_not_poison_main_changelog(eng, spark):
    """A CoW-shaped replacement on a side branch is equally invisible to
    main's changelog (previously it raised for main followers too)."""
    t = eng.create_table("e.b2", _rows(spark).schema)
    t.append(_rows(spark, 10))
    t.append(
        _rows(spark, 5, base=500),
        branch="dev",
        summary={"rewritten": "true"},  # net-change replacement marker
    )
    assert t.changes(0).count() == 10  # main replays fine


@pytest.mark.slow
def test_mv_storage_auto_expiry_optout(eng, spark):
    """ADVICE r9 #4: write.mv.auto-expire=false keeps every storage
    snapshot for long-lagging storage followers."""
    t = eng.create_table("e.src", _rows(spark).schema)
    t.append(_rows(spark, 30))
    eng.create_materialized_view("e.mv", "SELECT k, v FROM e.src WHERE k % 2 = 0")
    storage = eng.load_table("e.mv__storage")
    storage.metadata = storage.new_transaction().set_properties(
        {"write.mv.keep-snapshots": "2", "write.mv.auto-expire": "false"}
    ).commit()
    for i in range(8):
        delete_where(t, f"k = {2 * i}", mode="merge-on-read")
        eng.refresh_materialized_view("e.mv")
    storage = eng.load_table("e.mv__storage")
    # 2x keep-snapshots = 4 would have triggered expiry; opt-out keeps all
    assert len(storage.metadata.snapshots) > 4
    got = sorted(r.k for r in eng.scan_materialized_view("e.mv").collect())
    assert got == sorted(
        r.k for r in eng.sql("SELECT k FROM e.src WHERE k % 2 = 0").collect()
    )


@pytest.mark.slow
def test_mv_storage_is_cdc_followable_within_window(eng, spark):
    """A downstream consumer can follow the MV STORAGE table itself: delta
    refresh commits are MoR-shaped (overwrite without the rewritten
    marker), so the changelog replays them; within write.mv.keep-snapshots
    the feed survives auto-expiry."""
    t = eng.create_table("e.fsrc", _rows(spark).schema)
    t.append(_rows(spark, 20))
    eng.create_materialized_view("e.fmv", "SELECT k, v FROM e.fsrc WHERE k % 2 = 0")
    storage = eng.load_table("e.fmv__storage")
    base = storage.metadata.last_sequence_number
    delete_where(t, "k = 4", mode="merge-on-read")
    t.append(_rows(spark, 2, base=100))
    assert eng.refresh_materialized_view("e.fmv") == "incremental-changelog"
    storage = eng.load_table("e.fmv__storage")
    ch = storage.changes(base)
    ins = sorted(r.k for r in ch.where("_change_type = 'insert'").collect())
    dels = sorted(r.k for r in ch.where("_change_type = 'delete'").collect())
    assert dels == [4] and ins == [100]

@pytest.mark.slow
def test_explicit_hi_below_retained_window_replays(eng, spark):
    """ADVICE r10 (medium): after an append-only expiry (floor 0), a
    changes(lo, hi) whose EXPLICIT hi sits below the oldest retained
    ancestor's sequence must still replay — the events survive in the
    head's manifests with their original sequence numbers. The old anchor
    walk found no retained snapshot <= hi and silently returned []."""
    t = eng.create_table("e.hib", _rows(spark).schema)
    for i in range(5):
        t.append(_rows(spark, 10, base=i * 100))
    t = expire_snapshots(t, keep_last=1)
    assert t.metadata.properties.get("changelog.replay-floor") == "0"
    got = t.changes(0, 2)  # both commits are below the only retained snapshot
    assert sorted(r.k for r in got.collect()) == sorted(
        list(range(10)) + list(range(100, 110))
    )
    assert set(r._change_type for r in got.collect()) == {"insert"}
    # segment anchors at the oldest retained ancestor, range untouched
    segs = changelog_segments(t.metadata, 0, 2)
    assert [(lo, hi) for lo, hi, _ in segs] == [(0, 2)]


@pytest.mark.slow
def test_preexisting_dangling_chain_seeds_floor_conservatively(eng, spark):
    """ADVICE r10 (low): when the parent chain ALREADY dangles from a
    legacy (pre-floor-stamping) expiry, a later expire_snapshots must not
    seed the floor ratchet at 0 — that would flip the conservative
    'no floor recorded → refuse' into 'replay everything' across history
    whose commit shapes are unknowable. Seed = oldest retained - 1."""
    t = eng.create_table("e.legacy", _rows(spark).schema)
    for i in range(5):
        t.append(_rows(spark, 10, base=i * 100))
    snaps = sorted(t.metadata.snapshots.values(), key=lambda s: s.sequence_number)
    # legacy expiry: remove the two oldest snapshots WITHOUT stamping a floor
    t.metadata = (
        t.new_transaction().remove_snapshots([snaps[0].snapshot_id, snaps[1].snapshot_id]).commit()
    )
    assert t.metadata.properties.get("changelog.replay-floor") is None
    with pytest.raises(ValueError, match="expired|erased"):
        t.changes(0)  # conservative refusal pre-stamp
    t = expire_snapshots(t, keep_last=2)  # removes snaps[2]
    # floor seeded at oldest-retained-at-expiry-time - 1 (= seq 3 - 1), not 0
    assert t.metadata.properties.get("changelog.replay-floor") == str(
        snaps[2].sequence_number - 1
    )
    with pytest.raises(ValueError, match="expired|erased"):
        t.changes(0)  # still refuses across the unknowable gap
    # at the seeded floor: snaps[2]'s files survive in the head's manifests
    assert t.changes(snaps[2].sequence_number - 1).count() == 30
