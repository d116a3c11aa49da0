"""Table statistics files: per-column NDV via mergeable HLL sketch blobs.

Iceberg spec surface: ``TableMetadata.statistics`` entries point at a
statistics file per analyzed snapshot, each blob tagged with the snapshot
and sequence number it covers (the reference has no statistics support —
this is beyond-reference, spec-shaped). The sketch payloads are Spark's
native ``hll_sketch_agg`` binaries (Apache DataSketches HllSketch format,
readable by any DataSketches build).

The design point is INCREMENTAL analyze: sketches are mergeable, so
``analyze()`` after an append sketches ONLY the rows added since the last
analyzed sequence number and unions them with the stored blobs —
``sketch(A ∪ Δ) ≍ union(sketch(A), sketch(Δ))`` (registers are equivalent;
estimates differ <1% because a union reads through the composite estimator
while a one-pass sketch keeps HIP). At 100 TB that is the
difference between a stats refresh that scans a day's partition and one
that re-reads the table. Ranges containing row-level deletes or overwrites
fall back to a full recompute (a sketch cannot subtract).
"""

from __future__ import annotations

import os
import uuid as _uuid


from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.functions.local_rows import local_rows_df
from iceberg_rust_custom_spark.io.fileio import FileIO
from iceberg_rust_custom_spark.table.table import Table

# hll_sketch_agg accepts integral/string/binary inputs; everything else is
# cast to string (1:1 representation, so distinct counts are preserved)
_NATIVE = {"int", "long", "string", "binary"}
_LGK = 12  # ~2.7% relative error, 2^12 registers

STATS_BLOB_TYPE = "apache-datasketches-hll-v1"


def _sketch_cols(table: Table, columns: list[str] | None) -> list[str]:
    schema = table.metadata.current_schema()
    names = [f.name for f in schema.fields]
    if columns is None:
        return names
    missing = [c for c in columns if c not in names]
    if missing:
        raise ValueError(f"no such columns: {missing}")
    return list(columns)


def _sketch_rows(table: Table, df: DataFrame, cols: list[str]):
    """One aggregate job → [(column, sketch_bytes)] for the given frame."""
    schema = table.metadata.current_schema()
    types = {f.name: str(f.field_type) for f in schema.fields}
    aggs = []
    for c in cols:
        src = F.col(c) if types.get(c) in _NATIVE else F.col(c).cast("string")
        aggs.append(F.hll_sketch_agg(src, F.lit(_LGK)).alias(c))
    row = df.agg(*aggs).first()
    return [(c, row[c]) for c in cols if row[c] is not None]


def analyze(table: Table, columns: list[str] | None = None) -> Table:
    """Compute/refresh per-column NDV sketches for the current snapshot and
    commit a ``set-statistics`` metadata update pointing at the written
    stats file. Incremental when every snapshot since the last analyzed
    sequence number is a plain append."""
    snap = table.metadata.snapshot_for_ref()
    if snap is None:
        raise ValueError("cannot analyze an empty table (no snapshot)")
    cols = _sketch_cols(table, columns)

    prev = latest_statistics(table)
    prev_rows: list = []
    from_seq = 0
    if prev is not None:
        prev_cols = {b["fields"][0] for b in prev["blob-metadata"]}
        appends_only = True
        prev_seq = max(b["sequence-number"] for b in prev["blob-metadata"])
        for s in table.metadata.snapshots.values():
            if prev_seq < s.sequence_number <= snap.sequence_number:
                if s.summary.get("operation") != "append":
                    appends_only = False
                    break
        # prev is an ANCESTOR of the head by construction (latest_statistics
        # walks the ancestry), so after a rollback the abandoned entry can
        # never seed the merge — its blobs count rows the table dropped
        if appends_only and set(cols) <= prev_cols:
            from_seq = prev_seq
            prev_rows = [
                (c, sk)
                for c, sk in _load_sketches(prev["statistics-path"])
                if c in cols
            ]

    if from_seq >= snap.sequence_number:
        delta_rows = []  # already analyzed this sequence; nothing new
    elif from_seq:
        delta_rows = _sketch_rows(
            table, table.incremental_scan(from_seq, snap.sequence_number), cols
        )
    else:
        delta_rows = _sketch_rows(table, table.scan(), cols)

    # driver-side union of ≤2 sketches per column via one tiny Spark agg
    spark = table.spark
    all_rows = prev_rows + delta_rows
    if not all_rows:
        raise ValueError("nothing to sketch (no columns or no rows)")
    merged_df = (
        local_rows_df(spark, all_rows, "column string, hll_sketch binary")
        .groupBy("column")
        .agg(F.hll_union_agg("hll_sketch").alias("hll_sketch"))
        .select(
            "column", "hll_sketch", F.hll_sketch_estimate("hll_sketch").alias("ndv")
        )
    )
    merged = {r["column"]: (r["hll_sketch"], int(r["ndv"])) for r in merged_df.collect()}

    meta_dir = table.metadata.metadata_dir()
    if "://" not in meta_dir:
        os.makedirs(meta_dir, exist_ok=True)
    # spec-correct Puffin container (metadata/puffin.py): one
    # apache-datasketches-hll-v1 blob per column, fields = [field id]
    from iceberg_rust_custom_spark.metadata.puffin import HLL_BLOB_TYPE, write_puffin

    path = os.path.join(meta_dir, f"stats-{snap.snapshot_id}-{_uuid.uuid4().hex[:12]}.puffin")
    ordered = [c for c in cols if c in merged]
    schema_now = table.metadata.current_schema()

    def _fid(c):
        try:
            return [schema_now.field_by_name(c).field_id]
        except KeyError:
            return []

    write_puffin(
        path,
        [
            {
                "type": HLL_BLOB_TYPE,
                "fields": _fid(c),
                "snapshot-id": snap.snapshot_id,
                "sequence-number": snap.sequence_number,
                "data": merged[c][0],
                "properties": {"ndv": str(merged[c][1]), "column": c},
            }
            for c in ordered
        ],
        {"created-by": "iceberg_rust_custom_spark"},
    )

    entry = {
        "snapshot-id": snap.snapshot_id,
        "statistics-path": path,
        "file-size-in-bytes": FileIO.size(path),
        "blob-metadata": [
            {
                "type": STATS_BLOB_TYPE,
                "snapshot-id": snap.snapshot_id,
                "sequence-number": snap.sequence_number,
                "fields": [c],
                "properties": {"ndv": str(merged[c][1])},
            }
            for c in ordered
        ],
    }
    tx = table.new_transaction()
    tx._extra_updates.append({"action": "set-statistics", "statistics": entry})
    table.metadata = tx.commit()
    return table


def _load_sketches(path: str) -> list[tuple[str, bytes]]:
    """[(column, sketch_bytes)] from a statistics file — Puffin
    (current format) or the legacy parquet layout (pre-round-5 files)."""
    if path.endswith(".puffin"):
        from iceberg_rust_custom_spark.metadata.puffin import read_puffin

        meta, blobs = read_puffin(path)
        return [
            (b.get("properties", {}).get("column", ""), data)
            for b, data in zip(meta["blobs"], blobs)
        ]
    tbl = FileIO.pq_read_table(path)
    return list(zip(tbl["column"].to_pylist(), tbl["hll_sketch"].to_pylist()))


def latest_statistics(table: Table) -> dict | None:
    """The statistics entry of the nearest ANALYZED ancestor of the current
    head (walking parents) — after a rollback the abandoned branch's entry
    still exists but does not describe data the table now holds, so it is
    never returned."""
    by_snap = {e["snapshot-id"]: e for e in table.metadata.statistics}
    cur = table.metadata.snapshot_for_ref()
    while cur is not None:
        if cur.snapshot_id in by_snap:
            return by_snap[cur.snapshot_id]
        cur = (
            table.metadata.snapshots.get(cur.parent_snapshot_id)
            if cur.parent_snapshot_id is not None
            else None
        )
    return None


def table_statistics(table: Table) -> DataFrame:
    """The stored NDV statistics as a DataFrame ``(column, ndv,
    snapshot_id, sequence_number)`` — the `statistics` metadata table."""
    entry = latest_statistics(table)
    schema = "column string, ndv long, snapshot_id long, sequence_number long"
    if entry is None:
        return local_rows_df(table.spark, [], schema)
    rows = [
        (
            b["fields"][0],
            int(b["properties"]["ndv"]),
            b["snapshot-id"],
            b["sequence-number"],
        )
        for b in entry["blob-metadata"]
    ]
    return local_rows_df(table.spark, rows, schema)
