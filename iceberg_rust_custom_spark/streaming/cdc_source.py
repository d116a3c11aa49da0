"""Structured Streaming CDC source over an Iceberg table.

``spark.readStream.format("iceberg_custom_cdc")`` turns a table's commit
log into a streaming changelog: each micro-batch replays the row-level
changes of a sequence-number range as data rows plus ``_change_type``
('insert' | 'delete') and ``_commit_seq`` (the committing sequence number)
— the streaming twin of ``Table.changes`` (table/table.py). The reference
has no streaming surface at all (its incremental machinery stops at the
snapshot-range batch read, table/mod.rs:120-144); this is the piece that
lets a downstream pipeline *follow* a table instead of polling it.

Built on PySpark 4's Python DataSource API (pyspark.sql.datasource):

* **Offsets are sequence numbers** — monotonic, dense per commit, and
  stored in the query's checkpoint, so restart resumes exactly where the
  last batch committed (exactly-once with an idempotent or transactional
  sink, e.g. streaming/pipeline.py's lineage-tagged sinks).
* **The driver plans, executors read.** ``partitions(start, end)`` runs
  driver-side with full metadata access: it lists in-range data files
  (inserts) and decodes in-range tombstones (parquet position files and
  puffin DV blobs — both metadata-scale) into per-data-file position
  lists, suppressing rows already dead before the range. Executors get
  self-contained partitions (one file + optional positions) and read
  Parquet via Arrow — the driver never touches data bytes, so a batch
  over N new files fans out N-wide regardless of file size.
* **Position lists are chunked** (``max_positions_per_partition``) so a
  pathological tombstone never builds an oversized task.

Scope (v1, documented refusals rather than wrong answers — the same
correct-by-refusal posture as ``Table.changes`` on file-set replacements):

* file-set replacement commits (compaction, CoW row-level ops, dynamic
  overwrite) in a batch range raise — row identity is gone;
* equality deletes raise (their victims need a key join against older
  data files — use the batch ``Table.changes``, which computes them);
* column renames raise (executors match parquet columns by name; added
  columns read as NULL, the common evolution);
* variant columns raise (decode is a Spark-side transform).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

FORMAT_NAME = "iceberg_custom_cdc"


@dataclass
class ChangesPartition(InputPartition):
    """One executor task: a parquet data file, read fully (insert events,
    ``positions is None``) or at specific row positions (delete events)."""

    file_path: str
    commit_seq: int  # inserts: the file's commit; deletes: unused (per-pos)
    change_type: str  # 'insert' | 'delete'
    positions: list | None = None  # sorted row indices for delete events
    pos_seqs: list | None = None  # per-position committing sequence number


def _load_metadata(options):
    """Table metadata from options — either a ``warehouse`` (FileCatalog
    root) + ``table`` identifier, or a direct ``metadata_location``. Pure
    Python (the DataSource worker has no SparkSession)."""
    from iceberg_rust_custom_spark.io.fileio import FileIO
    from iceberg_rust_custom_spark.metadata.table_metadata import TableMetadata

    if options.get("metadata_location"):
        return TableMetadata.from_json(FileIO.read_text(options["metadata_location"]))
    warehouse, table = options.get("warehouse"), options.get("table")
    if not warehouse or not table:
        raise ValueError(
            f"{FORMAT_NAME} needs options warehouse+table or metadata_location"
        )
    from iceberg_rust_custom_spark.catalog.base import Identifier
    from iceberg_rust_custom_spark.catalog.file_catalog import FileCatalog

    location, kind = FileCatalog(warehouse).load(Identifier.parse(table))
    if kind != "table":
        raise ValueError(f"{table} is a {kind}, not a table")
    return TableMetadata.from_json(FileIO.read_text(location))


def _local(path: str) -> str:
    return path[7:] if path.startswith("file://") else path


def _read_parquet_positions(paths: list[str]):
    """Driver-side decode of parquet position-tombstone files (metadata
    scale: position lists, not data) → iterator of (data_path, pos)."""
    import pyarrow.parquet as pq

    for p in paths:
        t = pq.read_table(_local(p), columns=["file_path", "pos"])
        yield from zip(
            (str(v) for v in t.column("file_path").to_pylist()),
            t.column("pos").to_pylist(),
        )


class IcebergChangelogStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.options = dict(options)
        self.start_seq = int(self.options.get("starting_sequence", 0))
        self.cap = int(self.options.get("max_positions_per_partition", 2_000_000))
        # admission control: at most N commits per micro-batch (0 = all).
        # On a high-commit-rate table this bounds batch size so state and
        # sink commits stay micro, instead of one giant catch-up batch.
        # The FIRST batch after a checkpoint RESTART is never capped: the
        # reader cannot see the checkpointed offset before planning, and
        # returning an end below it would move the checkpoint backwards
        # (duplicate delivery) — so the cap engages from initialOffset
        # (fresh start) or after the first observed batch. availableNow
        # also computes its one target up front and ignores pacing; the cap
        # is for continuous/processing-time triggers.
        self.max_commits = int(self.options.get("max_commits_per_batch", 0))
        self._last_end: int | None = None

    # ------------------------------------------------------------- offsets
    def initialOffset(self) -> dict:
        # only called on a FRESH start (no checkpoint) — safe to engage the
        # cap from here; restarts skip this and get one uncapped catch-up
        self._last_end = self.start_seq
        return {"seq": self.start_seq}

    def latestOffset(self) -> dict:
        md = _load_metadata(self.options)
        head = md.last_sequence_number
        if not self.max_commits or self._last_end is None:
            self._last_end = head
            return {"seq": head}
        self._last_end = min(head, self._last_end + self.max_commits)
        return {"seq": self._last_end}

    def commit(self, end: dict) -> None:  # offsets live in the checkpoint
        return None

    # ----------------------------------------------------------- planning
    def partitions(self, start: dict, end: dict):
        from iceberg_rust_custom_spark.table.deletion_vectors import (
            parse_dv_frame,
            read_dv_blob,
        )
        from iceberg_rust_custom_spark.table.scan import (
            data_file_sequence_numbers,
            plan_delete_files,
            plan_files,
        )

        lo, hi = int(start["seq"]), int(end["seq"])
        if hi <= lo:
            return []
        md = _load_metadata(self.options)
        snap = md.snapshot_for_ref()
        for s in md.snapshots.values():
            if lo < s.sequence_number <= hi:
                op = s.summary.get("operation")
                if not (
                    op in ("append", "delete", "replace")
                    or (op == "overwrite" and s.summary.get("rewritten") != "true")
                ):
                    raise ValueError(
                        f"snapshot {s.snapshot_id} is a {op!r} file-set replacement "
                        "— the streaming changelog is only defined across "
                        "append/delete-shaped commits (run a fresh stream from "
                        "the current sequence number instead)"
                    )
        if md.current_schema().variant_field_names():
            raise ValueError(
                f"{FORMAT_NAME} does not decode variant columns — read the "
                "batch changelog (Table.changes) instead"
            )

        file_seqs = data_file_sequence_numbers(md, snap)
        parts: list[ChangesPartition] = []
        for f in plan_files(md, snap, None, (lo, hi)):
            parts.append(
                ChangesPartition(
                    f.file_path, file_seqs.get(f.file_path, hi), "insert"
                )
            )

        entries = plan_delete_files(md, snap)
        in_range = [e for e in entries if lo < e.sequence_number <= hi]
        pre_range = [e for e in entries if e.sequence_number <= lo]
        if any(e.data_file.content == 2 for e in in_range):
            raise ValueError(
                "equality deletes in the batch range — their victims need a "
                "key join against older data files; use Table.changes for "
                "batch CDC over this range"
            )
        if not in_range:
            return parts
        if any(e.data_file.content == 2 for e in pre_range):
            # pre-range equality-delete victims are unknown without reading
            # old data files; refusing keeps the no-re-emit guarantee exact
            raise ValueError(
                "pending pre-range equality deletes — in-range delete events "
                "cannot be de-duplicated against them; use Table.changes"
            )

        # first killing commit per (file, pos): a parquet tombstone and a DV
        # can both target the same row in one range
        killed: dict[str, dict[int, int]] = {}

        def record(dpath: str, pos: int, seq: int):
            slot = killed.setdefault(_local(dpath), {})
            if seq < slot.get(pos, 1 << 62):
                slot[pos] = seq

        pq_in = [
            e
            for e in in_range
            if e.data_file.content == 1 and e.data_file.file_format != "puffin"
        ]
        for e in pq_in:
            for dpath, pos in _read_parquet_positions([e.data_file.file_path]):
                record(dpath, pos, e.sequence_number)
        for e in in_range:
            d = e.data_file
            if d.content == 1 and d.file_format == "puffin":
                for pos in parse_dv_frame(read_dv_blob(d)).tolist():
                    record(d.referenced_data_file, pos, e.sequence_number)

        # rows already dead before the range never re-emit
        pre_dead: dict[str, set] = {}
        for e in pre_range:
            d = e.data_file
            if d.content != 1:
                continue
            if d.file_format == "puffin":
                pre_dead.setdefault(_local(d.referenced_data_file), set()).update(
                    parse_dv_frame(read_dv_blob(d)).tolist()
                )
            else:
                for dpath, pos in _read_parquet_positions([d.file_path]):
                    pre_dead.setdefault(_local(dpath), set()).add(pos)

        for dpath, posmap in killed.items():
            dead = pre_dead.get(dpath, ())
            live = sorted(p for p in posmap if p not in dead)
            for i in range(0, len(live), self.cap):
                chunk = live[i : i + self.cap]
                parts.append(
                    ChangesPartition(
                        dpath,
                        0,
                        "delete",
                        positions=chunk,
                        pos_seqs=[posmap[p] for p in chunk],
                    )
                )
        return parts

    # ------------------------------------------------------------- reading
    def read(self, partition: ChangesPartition):
        yield from _read_changes_partition(self.options, partition)


def _read_changes_partition(options, p: ChangesPartition):
    """Executor-side: one parquet file → Arrow batches in the source
    schema. Columns bind by NAME with a safe cast to the table's current
    type (int→long widening etc.); a column the file predates reads NULL."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql.pandas.types import to_arrow_schema

    md = _load_metadata(options)
    cur = md.current_schema()
    logical = cur.spark_schema()
    arrow = to_arrow_schema(logical)
    defaults = {f.name: f.initial_default for f in cur.fields}

    path = _local(p.file_path)
    if "://" in path:  # object store: route through the FileIO registry
        import io as _io

        from iceberg_rust_custom_spark.io.fileio import FileIO

        src = _io.BytesIO(FileIO.read_bytes(path))
        tbl = pq.read_table(src)
    else:
        tbl = pq.read_table(path)
    if p.positions is not None:
        tbl = tbl.take(pa.array(p.positions, type=pa.int64()))

    cols = []
    n = tbl.num_rows
    for f in arrow:
        if f.name in tbl.column_names:
            cols.append(tbl.column(f.name).cast(f.type))
        elif defaults.get(f.name) is not None:
            # v3 initial-default: rows written before the column existed
            # read back as the fixed add-time default (JSON single-value,
            # e.g. ISO strings for date/timestamp — cast like the scan does)
            v = defaults[f.name]
            try:
                cols.append(pa.array([v] * n, type=f.type))
            except (pa.ArrowInvalid, pa.ArrowTypeError, TypeError):
                cols.append(pa.array([v] * n).cast(f.type))
        else:  # added after this file was written, no default
            cols.append(pa.nulls(n, type=f.type))
    cols.append(pa.array([p.change_type] * n, type=pa.string()))
    if p.positions is not None:
        cols.append(pa.array(p.pos_seqs, type=pa.int64()))
    else:
        cols.append(pa.array([p.commit_seq] * n, type=pa.int64()))
    names = [f.name for f in arrow] + ["_change_type", "_commit_seq"]
    yield from pa.table(cols, names=names).to_batches(max_chunksize=1 << 16)


class IcebergChangelogBatchReader(DataSourceReader):
    """Batch flavor: ``spark.read.format("iceberg_custom_cdc")`` replays
    the full changelog from ``starting_sequence`` to the current head in
    one shot — same partitions, same executor read path. (For plain
    current-state reads use ``Table.scan`` — it stays on Spark's native
    vectorized parquet path with pushdown; this format is a change feed.)"""

    def __init__(self, options):
        self._stream = IcebergChangelogStreamReader(options)

    def partitions(self):
        end = self._stream.latestOffset()
        return self._stream.partitions(self._stream.initialOffset(), end)

    def read(self, partition: ChangesPartition):
        yield from _read_changes_partition(self._stream.options, partition)


class IcebergChangelogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        from pyspark.sql import types as T

        logical = _load_metadata(self.options).current_schema().spark_schema()
        return T.StructType(
            list(logical.fields)
            + [
                T.StructField("_change_type", T.StringType(), False),
                T.StructField("_commit_seq", T.LongType(), False),
            ]
        )

    def reader(self, schema):
        return IcebergChangelogBatchReader(self.options)

    def streamReader(self, schema):
        return IcebergChangelogStreamReader(self.options)


def register_cdc_source(spark) -> str:
    """Register the format on a session; returns the format name."""
    spark.dataSource.register(IcebergChangelogDataSource)
    return FORMAT_NAME
