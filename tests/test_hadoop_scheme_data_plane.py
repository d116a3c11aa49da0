"""r12 (VERDICT r11 #4): the WHOLE plane — metadata AND data — driven end
to end over a registered non-file Hadoop scheme, with no new jars.

Hadoop's bundled ViewFileSystem gives a genuine non-``file:`` scheme
(``viewfs://cluster/…``) whose mount table resolves to a local directory:
Spark writes/reads through it like any remote FileSystem, paths carry the
``viewfs://`` spelling everywhere (manifests, ``_metadata.file_path``,
tombstone bounds), and any bare-POSIX-path assumption breaks immediately.
The metadata plane rides the new ``HadoopFileIO`` backend (io/lister.py —
the iceberg-java HadoopFileIO analogue: any JVM-resolvable scheme), which
deliberately implements no ``list`` so data-plane enumeration stays on
io.lister's direct Hadoop route.

Also pins the review-r11 split-whitelist fix by scheme: paths WITH ':'
(s3a/viewfs style) keep the file-group-local MoR split enabled."""

import os
import time

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.io.fileio import FileIO
from iceberg_rust_custom_spark.io.lister import HadoopFileIO, canon_path, list_files
from iceberg_rust_custom_spark.table.maintenance import (
    delete_where,
    remove_orphan_files,
    update_where,
)
from iceberg_rust_custom_spark.table.scan import (
    _mor_touched_files,
    plan_delete_files,
    plan_files,
)


@pytest.fixture()
def viewfs(spark, tmp_path):
    """Mount viewfs://sgt/wh → a local dir and register the metadata-plane
    backend. The mount resolves locally, but every path the engine sees is
    a viewfs:// URI served by the JVM FileSystem."""
    root = tmp_path / "viewfs_root"
    root.mkdir()
    spark.sparkContext._jsc.hadoopConfiguration().set(
        "fs.viewfs.mounttable.sgt.link./wh", f"file://{root}"
    )
    FileIO.register("viewfs", HadoopFileIO())
    yield "viewfs://sgt/wh"
    FileIO._schemes.pop("viewfs", None)


@pytest.fixture()
def eng(spark, tmp_path):
    return Engine(spark, warehouse=str(tmp_path / "wh"))


@pytest.mark.slow
def test_viewfs_location_full_chain(eng, spark, viewfs, monkeypatch):
    """create → append (footer stats) → pruned scan → MoR delete →
    file-group-local split scan → CDC changelog → join-MV delta refresh →
    orphan cleanup, all with table locations on the viewfs:// scheme.
    The local os.walk fallback is booby-trapped: any bare-path assumption
    in the chain trips it."""
    from iceberg_rust_custom_spark.io import lister as L

    def _no_local(root):
        raise AssertionError(f"local fallback walked {root!r} during a viewfs drive")

    monkeypatch.setattr(L, "_local_list", _no_local)

    df = spark.range(2000).select(
        F.col("id").alias("k"),
        (F.col("id") % 40).alias("fk"),
        (F.col("id") * 1.5).alias("v"),
    )
    t = eng.create_table(
        "vf.t",
        df.schema,
        sort_by=["k"],
        properties={"write.distribution-mode": "range", "write.range-partitions": "4"},
        location=f"{viewfs}/ns/t",
    )
    t.append(df)

    # manifests record the viewfs spelling; footer stats were harvested
    # through the Hadoop ranged reader
    files = plan_files(t.metadata, t.metadata.snapshot_for_ref())
    assert files and all(f.file_path.startswith("viewfs://sgt/") for f in files)
    assert all(f.file_size_in_bytes > 0 and f.record_count > 0 for f in files)
    assert any(f.lower_bounds for f in files)
    assert len(files) >= 3
    # metadata-plane objects live on viewfs too (written via HadoopFileIO)
    metas = [f.path for f in list_files(f"{viewfs}/ns/t/metadata", spark)]
    assert metas and all(p.startswith("viewfs://") for p in metas)

    # stats-based file pruning works over the scheme
    assert t.count_planned_files("k < 300") < t.count_planned_files()
    assert t.scan("k < 300").count() == 300

    # MoR position delete: tombstones carry viewfs file_path bounds and
    # the file-group-local split stays ENABLED (':' is whitelisted)
    t = delete_where(t, "k >= 100 AND k < 130", mode="merge-on-read")
    md, snap = t.metadata, t.metadata.snapshot_for_ref()
    touched = _mor_touched_files(
        plan_files(md, snap), plan_delete_files(md, snap), md.current_schema(),
        md, snap, None, None,
    )
    assert touched is not None, "split disabled on a scheme-bearing warehouse"
    assert 1 <= len(touched) < len(files)
    assert t.scan().count() == 2000 - 30

    # CDC changelog replays the viewfs-addressed tombstones
    first = min(t.metadata.snapshots, key=lambda s: t.metadata.snapshots[s].sequence_number)
    ch = t.changes(t.metadata.snapshots[first].sequence_number)
    assert ch.where("_change_type = 'delete'").count() == 30

    # join-MV delta refresh with BOTH source and storage on viewfs
    dim = spark.range(40).select(
        F.col("id").alias("fk"), F.concat(F.lit("d"), F.col("id")).alias("dn")
    )
    d = eng.create_table("vf.d", dim.schema, location=f"{viewfs}/ns/d")
    d.append(dim)
    eng.create_materialized_view(
        "vf.mv", "SELECT t.k, t.v, d.dn FROM vf.t t JOIN vf.d d ON t.fk = d.fk"
    )
    st = eng.load_table("vf.mv__storage")
    before = {f.file_path for f in plan_files(st.metadata, st.metadata.snapshot_for_ref())}
    update_where(d, {"dn": "'upd'"}, "fk % 10 = 0", mode="merge-on-read")
    delete_where(t, "k IN (500, 501)", mode="merge-on-read")
    assert eng.refresh_materialized_view("vf.mv") == "incremental-changelog-join"
    st = eng.load_table("vf.mv__storage")
    after = {f.file_path for f in plan_files(st.metadata, st.metadata.snapshot_for_ref())}
    assert before <= after
    got = eng.scan_materialized_view("vf.mv").count()
    want = eng.sql("SELECT count(*) c FROM vf.t t JOIN vf.d d ON t.fk = d.fk").first().c
    assert got == want

    # orphan cleanup over the scheme: planted debris goes, data stays
    debris = f"{viewfs}/ns/t/data/debris/junk.parquet"
    FileIO.write_bytes(debris, b"not parquet")
    removed = remove_orphan_files(t, older_than_ms=int(time.time() * 1000) + 60_000)
    assert debris in removed
    assert not FileIO.exists(debris)
    assert t.scan().count() == 2000 - 32


def test_hadoop_fileio_roundtrip_and_ranged_reads(spark, viewfs, tmp_path):
    """The HadoopFileIO backend itself: byte round-trip, ranged reads,
    size/exists/delete — and parquet footer access through it costs
    O(footer), not a full download (ranged-read path)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    p = f"{viewfs}/io/blob.bin"
    FileIO.write_bytes(p, b"0123456789abcdef")
    assert FileIO.exists(p)
    assert FileIO.size(p) == 16
    assert FileIO.read_bytes(p) == b"0123456789abcdef"
    assert FileIO.read_range(p, 4, 6) == b"456789"
    FileIO.delete(p)
    assert not FileIO.exists(p)
    # parquet footer through the backend's ranged reader
    local = str(tmp_path / "t.parquet")
    pq.write_table(pa.table({"x": list(range(50_000))}), local)
    target = f"{viewfs}/io/t.parquet"
    FileIO.write_bytes(target, open(local, "rb").read())
    pf = FileIO.pq_parquet_file(target, spark=spark)
    assert pf.metadata.num_rows == 50_000
    # no `list` method: enumeration must stay on the lister's Hadoop route
    assert not hasattr(FileIO._schemes["viewfs"], "list")
    got = list_files(f"{viewfs}/io", spark)
    assert [f.path for f in got] == [target]


def test_split_whitelist_keeps_scheme_paths_enabled():
    """Review-r11 pin (VERDICT r11 #4 tail): the charset whitelist admits
    ':' — s3a/viewfs-style URIs keep the file-group-local MoR split; a
    percent-encodable character still disables it."""
    from dataclasses import dataclass, field

    @dataclass
    class D:
        content: int = 1
        file_format: str = "parquet"
        referenced_data_file: str | None = None
        lower_bounds: dict = field(default_factory=dict)
        upper_bounds: dict = field(default_factory=dict)

    @dataclass
    class E:
        data_file: object = None

    @dataclass
    class PF:
        file_path: str = ""

    files = [
        PF("s3a://bucket/wh/t/data/a.parquet"),
        PF("s3a://bucket/wh/t/data/m.parquet"),
        PF("s3a://bucket/wh/t/data/z.parquet"),
    ]
    tomb = D(
        lower_bounds={"file_path": "s3a://bucket/wh/t/data/a.parquet"},
        upper_bounds={"file_path": "s3a://bucket/wh/t/data/b.parquet"},
    )
    got = _mor_touched_files(files, [E(tomb)], None, None, None, None, None)
    assert got == {"s3a://bucket/wh/t/data/a.parquet"}, got
    # viewfs spelling too
    files_v = [PF("viewfs://c/wh/a.parquet"), PF("viewfs://c/wh/z.parquet")]
    tomb_v = D(
        lower_bounds={"file_path": "viewfs://c/wh/a.parquet"},
        upper_bounds={"file_path": "viewfs://c/wh/b.parquet"},
    )
    got = _mor_touched_files(files_v, [E(tomb_v)], None, None, None, None, None)
    assert got == {"viewfs://c/wh/a.parquet"}
    # percent-encodable character in bounds → split off (None), not wrong
    tomb_sp = D(
        lower_bounds={"file_path": "s3a://bucket/wh/t/data/a b.parquet"},
        upper_bounds={"file_path": "s3a://bucket/wh/t/data/c.parquet"},
    )
    assert _mor_touched_files(files, [E(tomb_sp)], None, None, None, None, None) is None
