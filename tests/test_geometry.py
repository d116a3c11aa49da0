"""Rectangle best-fit manifest selection (VERDICT r3 item 5).

Mirrors the reference's geometry tests (iceberg-rust/src/util/mod.rs:136-230)
plus the append-path selection rule (table/transaction/append.rs:96-141)."""

import datetime as dt
import json

import pytest

from iceberg_rust_custom_spark.metadata.manifest import DataFile, ManifestEntry
from iceberg_rust_custom_spark.table.geometry import (
    Rectangle,
    entries_rectangle,
    select_manifest_partitioned,
    summary_to_rectangle,
    try_sub,
)


def test_try_sub_valid():
    assert [try_sub(a, b) for a, b in zip([5, 10, 15], [2, 3, 5])] == [3, 7, 10]
    assert try_sub(5, 5) == 0
    assert try_sub(dt.date(2020, 2, 1), dt.date(2020, 1, 1)) == 31
    assert try_sub(dt.datetime(2020, 1, 1, 1), dt.datetime(2020, 1, 1)) == 3600.0


def test_try_sub_invalid_types():
    for left, right in [("b", "a"), (True, False), (None, 1), (1, None)]:
        with pytest.raises(TypeError):
            try_sub(left, right)


def test_rectangle_cmp_with_priority():
    larger = Rectangle([0, 0], [10, 10])
    smaller = Rectangle([1, 1], [8, 8])
    assert larger.cmp_with_priority(smaller) == 1
    assert smaller.cmp_with_priority(larger) == -1
    assert Rectangle([0, 0], [5, 5]).cmp_with_priority(Rectangle([1, 1], [6, 6])) == 0
    # earlier dimensions dominate: dim0 equal → dim1 decides
    assert Rectangle([0, 0], [5, 9]).cmp_with_priority(Rectangle([0, 0], [5, 3])) == 1
    # dim0 decides even when dim1 says otherwise
    assert Rectangle([0, 0], [9, 0]).cmp_with_priority(Rectangle([0, 0], [5, 100])) == 1
    assert Rectangle([], []).cmp_with_priority(Rectangle([], [])) == 0


def test_rectangle_expand():
    r = Rectangle([2, 2], [4, 4])
    r.expand(Rectangle([1, 3], [3, 6]))
    assert r.min == [1, 2] and r.max == [4, 6]


def _entry(**partition):
    return ManifestEntry(1, 0, 0, DataFile(file_path="f", partition=partition))


def test_entries_rectangle():
    rect = entries_rectangle([_entry(m=3, b=1), _entry(m=1, b=9), _entry(m=2, b=5)], ["m", "b"])
    assert rect.min == [1, 1] and rect.max == [3, 9]
    # missing / null partition value → None (caller falls back)
    assert entries_rectangle([_entry(m=None)], ["m"]) is None
    assert entries_rectangle([_entry()], ["m"]) is None
    assert entries_rectangle([], ["m"]) is None


def _ml_row(path, lo, hi, files=1):
    return {
        "manifest_path": path,
        "added_files_count": files,
        "existing_files_count": 0,
        "partitions": json.dumps(
            {
                "m": {
                    "contains_null": False,
                    "contains_nan": False,
                    "lower": lo,
                    "upper": hi,
                }
            }
        ),
    }


def test_summary_to_rectangle_decodes_types():
    s = {"d": {"lower": "2020-01-01", "upper": "2020-03-01"}}
    rect = summary_to_rectangle(s, ["d"], {"d": "date"})
    assert rect.min == [dt.date(2020, 1, 1)] and rect.max == [dt.date(2020, 3, 1)]
    assert summary_to_rectangle({}, ["d"], {}) is None  # no bounds → fall back


def test_select_manifest_least_growth():
    # manifests covering months [1,3] and [7,9]; a batch at month 8 should
    # land in the second (zero growth) — fewest-entries would pick the first
    rows = [_ml_row("a", 1, 3, files=1), _ml_row("b", 7, 9, files=5)]
    batch = entries_rectangle([_entry(m=8)], ["m"])
    chosen = select_manifest_partitioned(rows, batch, ["m"], {"m": "int"})
    assert chosen["manifest_path"] == "b"
    # batch at month 2 → first manifest
    batch = entries_rectangle([_entry(m=2)], ["m"])
    assert select_manifest_partitioned(rows, batch, ["m"], {"m": "int"})["manifest_path"] == "a"
    # tie → first candidate wins (reference keeps current selection on Equal)
    rows_eq = [_ml_row("x", 1, 3), _ml_row("y", 2, 4)]
    batch = entries_rectangle([_entry(m=2), _entry(m=3)], ["m"])
    assert (
        select_manifest_partitioned(rows_eq, batch, ["m"], {"m": "int"})["manifest_path"] == "x"
    )
    # unreadable candidate bounds → None → caller falls back
    assert (
        select_manifest_partitioned(
            [_ml_row("a", 1, 3), {"manifest_path": "n", "partitions": "{}"}],
            batch,
            ["m"],
            {"m": "int"},
        )
        is None
    )
    # string partition values have no extent: a single candidate needs no
    # comparison (merging into the only manifest is always right), but
    # choosing AMONG candidates falls back (TypeError → None)
    sbatch = entries_rectangle([_entry(m="ab")], ["m"])
    srows = [_ml_row("s", "aa", "bb")]
    assert select_manifest_partitioned(srows, sbatch, ["m"], {"m": "string"})["manifest_path"] == "s"
    srows = [_ml_row("s1", "aa", "bb"), _ml_row("s2", "ba", "ca")]
    assert select_manifest_partitioned(srows, sbatch, ["m"], {"m": "string"}) is None


def test_append_targets_spatially_close_manifest(spark, tmp_path):
    """End-to-end: repeated appends to disjoint month ranges keep each
    manifest's rectangle tight instead of interleaving by size."""
    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.metadata.manifest import read_manifest_list
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema

    sch = Schema(
        0,
        (
            NestedField(1, "id", "long", True),
            NestedField(2, "m", "int", True),
            NestedField(3, "v", "double", True),
        ),
    )
    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    t = eng.create_table("test.rect", sch, partition_by=[("m", "identity")])

    def batch(ids, months):
        return spark.createDataFrame(
            [(i, m, float(i)) for i, m in zip(ids, months)], sch.spark_schema()
        )

    t.append(batch([1, 2], [1, 2]))  # manifest A: months 1-2
    t.append(batch([3, 4], [11, 12]))  # manifest B... or merged into A
    t.append(batch([5], [12]))  # month 12 must join the 11-12 manifest if split
    md = t.metadata
    rows = read_manifest_list(md.snapshot_for_ref().manifest_list)
    # however balancing grouped them, no query loses rows
    got = sorted(r["id"] for r in t.scan().collect())
    assert got == [1, 2, 3, 4, 5]
    # and if months 1-2 and 11-12 ended in separate manifests, the month-12
    # append must NOT have widened the 1-2 manifest
    by_bounds = []
    for r in rows:
        s = json.loads(r.get("partitions") or "{}").get("m") or {}
        if s.get("lower") is not None:
            by_bounds.append((s["lower"], s["upper"]))
    if len(by_bounds) > 1:
        assert (1, 2) in by_bounds  # tight low-months rectangle preserved
