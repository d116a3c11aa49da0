"""FileIO: scheme-dispatched metadata storage (io/fileio.py). The mem://
scheme proves the whole metadata plane — table metadata JSON, Parquet
manifests + manifest lists, Avro interop files — is storage-agnostic: an
S3 backend is a FileIO.register away, mirroring the reference's
object_store-everywhere design."""

import pytest

from iceberg_rust_custom_spark.io.fileio import FileIO


def test_scheme_dispatch_and_errors(tmp_path):
    p = str(tmp_path / "x.txt")
    FileIO.write_text(p, "hello")
    assert FileIO.read_text(p) == "hello"
    assert FileIO.exists(p) and not FileIO.exists(p + ".nope")
    FileIO.write_text("file://" + p, "hello2")
    assert FileIO.read_text(p) == "hello2"
    FileIO.write_bytes("mem://bucket/a/b", b"\x00\x01")
    assert FileIO.read_bytes("mem://bucket/a/b") == b"\x00\x01"
    with pytest.raises(FileNotFoundError):
        FileIO.read_bytes("mem://bucket/missing")
    with pytest.raises(ValueError, match="no FileIO backend"):
        FileIO.read_bytes("s3://bucket/key")


def test_manifests_on_mem_scheme():
    """Manifest + manifest-list round trip entirely on mem:// (no local
    files touched)."""
    from iceberg_rust_custom_spark.metadata.manifest import (
        DataFile,
        ManifestEntry,
        read_manifest,
        read_manifest_list,
        write_manifest,
        write_manifest_list,
    )

    entries = [
        ManifestEntry(
            1,
            7,
            1,
            DataFile(
                file_path="/data/f1.parquet",
                partition={"m": 3},
                record_count=10,
                file_size_in_bytes=100,
                lower_bounds={"a": 1},
                upper_bounds={"a": 9},
            ),
        )
    ]
    row = write_manifest("mem://wh/meta/m1.parquet", entries)
    assert row["added_files_count"] == 1
    back = read_manifest("mem://wh/meta/m1.parquet")
    assert back[0].data_file.file_path == "/data/f1.parquet"
    assert back[0].data_file.partition == {"m": 3}
    write_manifest_list("mem://wh/meta/snap.parquet", [row])
    (r,) = read_manifest_list("mem://wh/meta/snap.parquet")
    assert r["manifest_path"] == "mem://wh/meta/m1.parquet"


def test_avro_on_mem_scheme():
    from iceberg_rust_custom_spark.metadata.avro_codec import read_ocf, write_ocf

    schema = {"type": "record", "name": "r", "fields": [{"name": "x", "type": "long"}]}
    write_ocf("mem://wh/meta/m.avro", schema, [{"x": 1}, {"x": 2}])
    _, _, recs = read_ocf("mem://wh/meta/m.avro")
    assert recs == [{"x": 1}, {"x": 2}]


def test_plan_files_over_mem_metadata():
    """Scan planning (two-level pruning) works with the entire manifest
    tree on mem:// — the metadata plane never assumes a local path."""
    from iceberg_rust_custom_spark.metadata.expressions import parse_predicate
    from iceberg_rust_custom_spark.metadata.manifest import (
        DataFile,
        ManifestEntry,
        write_manifest,
        write_manifest_list,
    )
    from iceberg_rust_custom_spark.metadata.partition import PartitionSpec
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
    from iceberg_rust_custom_spark.metadata.snapshot import Snapshot
    from iceberg_rust_custom_spark.metadata.table_metadata import TableMetadata
    from iceberg_rust_custom_spark.table.scan import plan_files

    schema = Schema(0, (NestedField(1, "a", "long", True),))
    rows = []
    for i, (lo, hi) in enumerate([(0, 9), (10, 19), (20, 29)]):
        e = ManifestEntry(
            1, 7, 1,
            DataFile(
                file_path=f"/data/f{i}.parquet",
                record_count=10,
                file_size_in_bytes=100,
                lower_bounds={"a": lo},
                upper_bounds={"a": hi},
                value_counts={"a": 10},
                null_value_counts={"a": 0},
            ),
        )
        rows.append(write_manifest(f"mem://wh/meta/m{i}.parquet", [e]))
    write_manifest_list("mem://wh/meta/snap.parquet", rows)
    md = TableMetadata(
        table_uuid="u", location="mem://wh", schemas={0: schema}, current_schema_id=0,
        partition_specs={0: PartitionSpec()}, current_snapshot_id=7,
        snapshots={7: Snapshot(7, 1, 0, "mem://wh/meta/snap.parquet")},
    )
    snap = md.snapshot_for_ref()
    assert len(plan_files(md, snap, None)) == 3
    pruned = plan_files(md, snap, parse_predicate("a >= 15 AND a < 25"))
    assert sorted(f.file_path for f in pruned) == ["/data/f1.parquet", "/data/f2.parquet"]
