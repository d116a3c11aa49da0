"""Snapshot scan with two-level statistics pruning.

Spark-first re-expression of the reference's scan planning
(datafusion_iceberg/src/table.rs:158-215, 249-505):

1. resolve snapshot → manifest list,
2. **manifest-level prune**: project the predicate onto partition values and
   test it against each manifest's FieldSummary bounds
   (pruning_statistics.rs:32-127),
3. **file-level prune**: test the full predicate against each data file's
   min/max/null-count stats (pruning_statistics.rs:129-218), plus the exact
   per-file partition tuple,
4. hand the surviving file list to ``spark.read.parquet`` — projection,
   residual filtering, limit, and row-group skipping are Catalyst's job
   (the reference likewise re-applies filters after the scan: its pushdown
   is declared Inexact, table.rs:237-245).

The pruning itself runs on the driver over tiny metadata parquet files; at
very large file counts the same manifests are Spark-readable (see
metadata/manifest.py) and steps 2-3 become a distributed metadata join.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from iceberg_rust_custom_spark.io.lister import canon_path
from iceberg_rust_custom_spark.functions.local_rows import local_rows_df
from iceberg_rust_custom_spark.metadata.expressions import (
    Expr,
    FileBounds,
    may_match,
    parse_predicate,
    project_to_partition,
)
from iceberg_rust_custom_spark.metadata.manifest import (
    STATUS_DELETED,
    DataFile,
    read_manifest,
    read_manifest_list,
)
from iceberg_rust_custom_spark.metadata.schema import Schema
from iceberg_rust_custom_spark.metadata.snapshot import Snapshot
from iceberg_rust_custom_spark.metadata.table_metadata import TableMetadata


class _PartitionBounds:
    """FieldBounds adapter over manifest-list FieldSummary (JSON) with values
    decoded per partition-field result type."""

    def __init__(self, summaries: dict, result_types: dict):
        self._s = summaries
        self._types = result_types

    @staticmethod
    def _nan_guard(v):
        # NaN bounds are unusable for range pruning (always-False compares)
        return None if isinstance(v, float) and v != v else v

    def lower(self, col):
        from iceberg_rust_custom_spark.metadata.manifest import decode_value

        s = self._s.get(col)
        return self._nan_guard(decode_value(s["lower"], self._types.get(col, "string"))) if s else None

    def upper(self, col):
        from iceberg_rust_custom_spark.metadata.manifest import decode_value

        s = self._s.get(col)
        return self._nan_guard(decode_value(s["upper"], self._types.get(col, "string"))) if s else None

    def null_count(self, col):
        s = self._s.get(col)
        if s is None:
            return None
        return 1 if s.get("contains_null") else 0

    def nan_count(self, col):
        s = self._s.get(col)
        if s is None or s.get("contains_nan") is None:
            return None
        return 1 if s.get("contains_nan") else 0

    def is_float(self, col):
        return self._types.get(col) in ("float", "double")

    def value_count(self, col):
        return None


def _cached_entries(cache: dict | None, path: str, row: dict, use_process_cache: bool = True):
    """One manifest read per scan even when planning, delete detection and
    sequence mapping all walk the same manifests (r2 bench regression: the
    MoR scan path deserialized every manifest up to three times).
    ``use_process_cache=False`` skips the process-level manifest cache for
    over-capacity working sets (see read_manifest)."""
    if cache is None:
        return read_manifest(path, row, use_cache=use_process_cache)
    if path not in cache:
        cache[path] = read_manifest(path, row, use_cache=use_process_cache)
    return cache[path]


def _fits_process_cache(manifest_rows: list[dict]) -> bool:
    """True when the snapshot's total entry count fits the process cache —
    caching an over-capacity working set is cyclic insert+evict thrash."""
    from iceberg_rust_custom_spark.metadata.manifest import _MANIFEST_CACHE_MAX_ENTRIES

    total = sum(
        r.get("added_files_count", 0) + r.get("existing_files_count", 0) for r in manifest_rows
    )
    return total <= _MANIFEST_CACHE_MAX_ENTRIES


def plan_files(
    metadata: TableMetadata,
    snapshot: Snapshot | None,
    predicate: Expr | None = None,
    sequence_number_range: tuple[int, int] | None = None,
    ml_rows: list[dict] | None = None,
    entry_cache: dict | None = None,
    report: dict | None = None,
) -> list[DataFile]:
    """Two-level pruned data-file listing. ``sequence_number_range=(start,end]``
    gives incremental reads (reference: table/mod.rs:120-144). ``ml_rows``
    lets callers that already read the manifest list (scan_to_dataframe's
    routing decision) pass it in instead of re-reading it (ADVICE r2: the
    double read is two metadata round trips per query on remote FileIO)."""
    if snapshot is None:
        return []
    schema = metadata.schemas.get(snapshot.schema_id, metadata.current_schema())

    # After partition evolution, manifests written under different specs
    # coexist in one snapshot; each must be decoded and pruned with its own
    # spec (the reference stores partition_spec_id per manifest-list entry,
    # manifest_list.rs:26-59). Lazily build (result_types, projected
    # predicate) per spec id.
    _spec_cache: dict[int, tuple[dict, object]] = {}

    def for_spec(spec_id: int) -> tuple[dict, object]:
        if spec_id not in _spec_cache:
            spec = metadata.partition_specs.get(spec_id, metadata.default_spec())
            result_types = {}
            for pf in spec.fields:
                try:
                    src = schema.field_by_id(pf.source_id)
                except KeyError:
                    continue  # source column dropped by schema evolution
                tname = src.field_type if isinstance(src.field_type, str) else "string"
                result_types[pf.name] = pf.transform.result_type(tname)
            part_pred = (
                project_to_partition(predicate, schema, spec) if predicate is not None else None
            )
            _spec_cache[spec_id] = (result_types, part_pred)
        return _spec_cache[spec_id]

    manifest_rows = ml_rows if ml_rows is not None else read_manifest_list(snapshot.manifest_list)
    use_process_cache = _fits_process_cache(manifest_rows)
    if report is not None:
        report.update(
            manifests_total=len(manifest_rows),
            manifests_pruned=0,
            files_scanned=0,
            files_planned=0,
            bytes_planned=0,
            rows_planned=0,
        )
    out: list[DataFile] = []
    for row in manifest_rows:
        result_types, part_pred = for_spec(row.get("partition_spec_id", metadata.default_spec_id))
        if sequence_number_range is not None:
            start, end = sequence_number_range
            # whole manifest outside (start, end] → skip without opening it
            if row["sequence_number"] <= start or row["min_sequence_number"] > end:
                if report is not None:
                    report["manifests_pruned"] += 1
                continue
        if part_pred is not None and row.get("partitions"):
            summaries = json.loads(row["partitions"])
            if summaries and not may_match(part_pred, _PartitionBounds(summaries, result_types)):
                if report is not None:
                    report["manifests_pruned"] += 1
                continue  # manifest-level skip
        for entry in _cached_entries(entry_cache, row["manifest_path"], row, use_process_cache):
            if report is not None and entry.status != STATUS_DELETED and entry.data_file.content == 0:
                report["files_scanned"] += 1
            if _entry_survives(
                entry, predicate, part_pred, result_types, schema, sequence_number_range
            ):
                out.append(entry.data_file)
                if report is not None:
                    report["files_planned"] += 1
                    report["bytes_planned"] += entry.data_file.file_size_in_bytes
                    report["rows_planned"] += entry.data_file.record_count
    return out


def _entry_survives(
    entry,
    predicate,
    part_pred,
    result_types: dict,
    schema: Schema,
    sequence_number_range: tuple[int, int] | None,
) -> bool:
    """Per-entry prune decision, shared verbatim by the driver walk
    (plan_files) and the distributed planner (plan_files_distributed) so
    the two paths cannot drift."""
    if entry.status == STATUS_DELETED:
        return False
    if sequence_number_range is not None:
        start, end = sequence_number_range
        if not (start < entry.sequence_number <= end):
            return False
    df = entry.data_file
    if part_pred is not None and df.partition:
        pb = _PartitionBounds(
            {
                k: {
                    "lower": v,
                    "upper": v,
                    "contains_null": v is None,
                    "contains_nan": isinstance(v, float) and v != v,
                }
                for k, v in df.partition.items()
            },
            result_types,
        )
        if not may_match(part_pred, pb):
            return False  # exact partition-tuple skip
    if df.content != 0:
        return False  # position-delete files: plan_delete_files
    if predicate is not None:
        fb = FileBounds(
            df.lower_bounds,
            df.upper_bounds,
            df.null_value_counts,
            df.value_counts,
            schema,
            blooms=df.bloom_filters,
            nans=df.nan_value_counts,
        )
        if not may_match(predicate, fb):
            return False  # file-level stats skip
    return True


#: above this many live files in a snapshot, scan planning itself becomes a
#: Spark job over the manifest parquets instead of a driver walk
DISTRIBUTED_PLANNING_THRESHOLD = 100_000


def plan_files_distributed(
    spark: SparkSession,
    metadata: TableMetadata,
    snapshot: Snapshot | None,
    predicate: Expr | None = None,
    sequence_number_range: tuple[int, int] | None = None,
    ml_rows: list[dict] | None = None,
) -> list[DataFile]:
    """The 100 TB planning path: manifest-LIST pruning stays on the driver
    (one tiny file), but the per-entry file-level prune — the part that is
    O(live files) — runs as a Spark job over the manifest parquets with
    ``mapInPandas``, evaluating the SAME ``_entry_survives`` decision the
    driver walk uses (no semantic drift). Only surviving entries are
    collected; with real pruning that result is orders of magnitude smaller
    than the manifest tree. At 10^6 files the driver walk deserializes
    every entry in Python on one core; this spreads it across the cluster.
    """
    import pandas as pd

    from iceberg_rust_custom_spark.metadata.manifest import row_to_entry

    if snapshot is None:
        return []
    schema = metadata.schemas.get(snapshot.schema_id, metadata.current_schema())

    # driver side: manifest-level prune, grouped by partition spec (each
    # manifest decodes partition tuples with its own spec)
    groups: dict[int, list[str]] = {}
    per_spec: dict[int, tuple[dict, object]] = {}
    if ml_rows is None:
        ml_rows = read_manifest_list(snapshot.manifest_list)
    for row in ml_rows:
        spec_id = row.get("partition_spec_id", metadata.default_spec_id)
        if spec_id not in per_spec:
            spec = metadata.partition_specs.get(spec_id, metadata.default_spec())
            result_types = {}
            for pf in spec.fields:
                try:
                    src = schema.field_by_id(pf.source_id)
                except KeyError:
                    continue
                tname = src.field_type if isinstance(src.field_type, str) else "string"
                result_types[pf.name] = pf.transform.result_type(tname)
            part_pred = (
                project_to_partition(predicate, schema, spec) if predicate is not None else None
            )
            per_spec[spec_id] = (result_types, part_pred)
        result_types, part_pred = per_spec[spec_id]
        if sequence_number_range is not None:
            start, end = sequence_number_range
            if row["sequence_number"] <= start or row["min_sequence_number"] > end:
                continue
        if part_pred is not None and row.get("partitions"):
            summaries = json.loads(row["partitions"])
            if summaries and not may_match(part_pred, _PartitionBounds(summaries, result_types)):
                continue
        groups.setdefault(spec_id, []).append(row["manifest_path"])

    # the full stats surface must round-trip through the executor decode:
    # omitting nan_value_counts made the distributed path treat every float
    # column as possibly-NaN, disabling >/>= file pruning (ADVICE r3);
    # split_offsets/sort_order_id/equality_ids ride along so entries planned
    # distributed are indistinguishable from driver-walked ones.
    schema_cols = MANIFEST_ENTRY_SPARK_SCHEMA + (
        ", bloom_filters string, nan_value_counts string, distinct_counts string"
        ", split_offsets string, sort_order_id int, equality_ids string"
        ", referenced_data_file string, content_offset long, content_size_in_bytes long"
        ", first_row_id long"
    )
    out: list[DataFile] = []
    for spec_id, paths in groups.items():
        result_types, part_pred = per_spec[spec_id]
        pq_paths = [p for p in paths if not p.endswith(".avro")]
        avro_paths = [p for p in paths if p.endswith(".avro")]

        def prune(batches, _rt=result_types, _pp=part_pred):
            for pdf in batches:
                keep = [
                    i
                    for i, row in enumerate(pdf.to_dict("records"))
                    if _entry_survives(
                        row_to_entry(row), predicate, _pp, _rt, schema, sequence_number_range
                    )
                ]
                yield pdf.iloc[keep] if keep else pdf.iloc[0:0]

        if pq_paths:
            pruned = (
                spark.read.schema(schema_cols)
                .parquet(*pq_paths)
                .mapInPandas(prune, schema_cols)
                .collect()
            )
            out.extend(row_to_entry(r.asDict()).data_file for r in pruned)
        if avro_paths:
            # Avro manifests (write.metadata.format=avro): Spark ships no
            # spark-avro module here, but the manifests are self-describing
            # and our pure-Python OCF reader runs fine inside executors —
            # fan the PATHS out and decode+prune per task.
            from iceberg_rust_custom_spark.metadata.manifest import entry_to_row, read_manifest

            names = [c.split(" ")[0] for c in schema_cols.split(", ")]

            def prune_avro(batches, _rt=result_types, _pp=part_pred):
                for pdf in batches:
                    rows = []
                    for p in pdf["manifest_path"]:
                        for e in read_manifest(p):
                            if _entry_survives(
                                e, predicate, _pp, _rt, schema, sequence_number_range
                            ):
                                r = entry_to_row(e)
                                rows.append([r.get(n) for n in names])
                    yield pd.DataFrame(rows, columns=names)

            pruned = (
                local_rows_df(spark, [(p,) for p in avro_paths], "manifest_path string")
                .repartition(min(len(avro_paths), 256))
                .mapInPandas(prune_avro, schema_cols)
                .collect()
            )
            out.extend(row_to_entry(r.asDict()).data_file for r in pruned)
    return out


def snapshot_live_file_count(snapshot: Snapshot | None, ml_rows: list[dict] | None = None) -> int:
    """Live-file estimate from manifest-list counters alone (no manifest
    reads) — the routing signal between driver and distributed planning."""
    if snapshot is None:
        return 0
    if ml_rows is None:
        ml_rows = read_manifest_list(snapshot.manifest_list)
    return sum(
        r.get("added_files_count", 0) + r.get("existing_files_count", 0) for r in ml_rows
    )


def plan_delete_files(
    metadata: TableMetadata,
    snapshot: Snapshot | None,
    ml_rows: list[dict] | None = None,
    entry_cache: dict | None = None,
) -> list:
    """All live delete-file manifest entries — position deletes (content=1)
    and equality deletes (content=2), with their sequence numbers (equality
    deletes only apply to data files with a STRICTLY OLDER sequence number,
    so a re-inserted key survives). Never pruned by the scan predicate — a
    delete must suppress its row no matter what the query filters on.
    Delete files are metadata-scale, so reading them all is cheap."""
    if snapshot is None:
        return []
    if ml_rows is None:
        ml_rows = read_manifest_list(snapshot.manifest_list)
    out = []
    use_process_cache = _fits_process_cache(ml_rows)
    for row in ml_rows:
        if row.get("content", 0) == 1 or not row["manifest_path"].endswith(".avro"):
            for entry in _cached_entries(entry_cache, row["manifest_path"], row, use_process_cache):
                if entry.status != STATUS_DELETED and entry.data_file.content in (1, 2):
                    out.append(entry)
    return out


def _iceberg_type_name(field_type) -> str:
    return field_type if isinstance(field_type, str) else field_type.get("type", "string")


def eq_delete_can_touch(
    data_file: DataFile,
    delete_file: DataFile,
    schema: Schema,
    schemas: dict | None = None,
) -> bool:
    """Can this equality-delete file possibly match ANY row of this data
    file? False only when some key column's [lower, upper] bounds are
    provably disjoint between the two files (and a NULL-key match is
    impossible) — the same predicate-over-bounds test ``plan_files`` runs,
    applied between a delete file's own footer bounds (harvested at
    ``delete_by_key`` commit time) and the data file's. Exact min/max on
    both sides make this sound: disjoint bounds ⇒ zero matching rows ⇒
    the file holds no victims and scan-time application is a no-op on it.

    ``schemas`` (the table's schema map) resolves the data file's bounds
    by FIELD ID through its write schema: a file's stats are keyed by the
    WRITER's column name, so after a rename frees a name that a new field
    reuses, looking the current name up directly would misattribute the
    OLD field's range to the new key column (review r9). A key field the
    file predates evaluates against the current schema's initial-default
    instead — exactly the value the scan substitutes.

    VERDICT r8 weak #1: without this, every strictly-older live file was a
    victim candidate — a 100-key delete on a 100 TB table read every older
    data file to find victims."""
    return _eq_can_touch_prepared(
        eq_delete_prep(delete_file, schema), data_file, schemas
    )


def eq_delete_prep(delete_file: DataFile, schema: Schema) -> tuple | None:
    """Precompute the data-file-INDEPENDENT half of ``eq_delete_can_touch``
    (key-field resolution + the delete file's decoded bounds): callers
    testing one delete against MANY data files (scan-side pruning, victim
    candidates) build this once per delete entry instead of re-deriving it
    per (delete, file) pair — review r10 flagged the rebuild inside a
    potentially 2M-pair loop. ``None`` = unknown key set: always touches."""
    from iceberg_rust_custom_spark.metadata.manifest import decode_value

    id_to_field = {f.field_id: f for f in schema.fields}
    key_fields = [
        id_to_field[i] for i in (delete_file.equality_ids or ()) if i in id_to_field
    ]
    if not key_fields:
        return None  # unknown key set (legacy file): conservative
    per_key = []
    for kf in key_fields:
        col = kf.name  # delete-file bounds are keyed by CURRENT name
        tname = _iceberg_type_name(kf.field_type)
        dl = delete_file.lower_bounds.get(col)
        du = delete_file.upper_bounds.get(col)
        ddl = ddu = None
        if dl is not None and du is not None:
            try:
                ddl, ddu = decode_value(dl, tname), decode_value(du, tname)
            except Exception:
                ddl = ddu = None  # undecodable delete bounds: no prune here
        per_key.append(
            (kf, col, tname, ddl, ddu, delete_file.null_value_counts.get(col))
        )
    return tuple(per_key)


def _eq_can_touch_prepared(
    prep, data_file: DataFile, schemas: dict | None, wname_cache: dict | None = None
) -> bool:
    from iceberg_rust_custom_spark.metadata.manifest import decode_value

    if prep is None:
        return True
    writer = (schemas or {}).get(data_file.schema_id)
    wnames = None
    if writer is not None:
        if wname_cache is not None:
            wnames = wname_cache.get(data_file.schema_id)
        if wnames is None:
            wnames = {f.field_id: f.name for f in writer.fields}
            if wname_cache is not None:
                wname_cache[data_file.schema_id] = wnames
    for kf, col, tname, ddl, ddu, d_nulls in prep:
        if writer is not None:
            wname = wnames.get(kf.field_id)
            if wname is None:
                # field postdates the file: every row logically holds the
                # current schema's initial-default — compare THAT constant
                v = kf.initial_default
                if v is None:
                    # rows are NULL: a match needs a NULL delete key
                    if d_nulls == 0:
                        return False
                    continue
                if ddl is None or ddu is None:
                    continue
                try:
                    if not (ddl <= decode_value(v, tname) <= ddu):
                        return False
                except TypeError:
                    pass
                continue
        else:
            wname = col  # legacy file without a recorded write schema
        fl = data_file.lower_bounds.get(wname)
        fu = data_file.upper_bounds.get(wname)
        if ddl is None or ddu is None or fl is None or fu is None:
            continue  # a side without bounds can't prune on this column
        # NULL keys bypass range logic: prune on this column only when a
        # null-to-null match is impossible (either side provably null-free;
        # an UNKNOWN null count must be treated as possibly-null)
        f_nulls = data_file.null_value_counts.get(wname)
        if (d_nulls is None or d_nulls > 0) and (f_nulls is None or f_nulls > 0):
            continue
        try:
            if ddu < decode_value(fl, tname) or ddl > decode_value(fu, tname):
                return False  # conjunctive key: one impossible column kills it
        except TypeError:
            continue  # incomparable representations: no prune
    return True


def eq_victim_candidates(
    files: list[DataFile],
    eq_entries: list,
    schema: Schema,
    file_seqs: dict,
    schemas: dict | None = None,
) -> list[DataFile]:
    """Data files that MAY hold victims of the given equality-delete
    manifest entries: strictly older than at least one delete (Iceberg
    sequence gating) AND key-bounds-intersecting with it
    (``eq_delete_can_touch``; pass ``schemas`` so evolved files resolve
    their bounds by field id). Shared by the batch changelog, the
    streaming CDC planner, CoW carried-delete materialization, and
    position-delete consolidation."""
    preps = [(e, eq_delete_prep(e.data_file, schema)) for e in eq_entries]
    wcache: dict = {}
    out = []
    for f in files:
        fseq = file_seqs.get(f.file_path, 0)
        for e, prep in preps:
            if e.sequence_number > fseq and _eq_can_touch_prepared(
                prep, f, schemas, wcache
            ):
                out.append(f)
                break
    return out


def data_file_sequence_numbers(
    metadata: TableMetadata,
    snapshot: Snapshot | None,
    ml_rows: list[dict] | None = None,
    entry_cache: dict | None = None,
) -> dict:
    """file_path → sequence number for every live data file (needed to
    order data against equality deletes)."""
    if snapshot is None:
        return {}
    if ml_rows is None:
        ml_rows = read_manifest_list(snapshot.manifest_list)
    out = {}
    use_process_cache = _fits_process_cache(ml_rows)
    for row in ml_rows:
        for entry in _cached_entries(entry_cache, row["manifest_path"], row, use_process_cache):
            if entry.status != STATUS_DELETED and entry.data_file.content == 0:
                out[entry.data_file.file_path] = entry.sequence_number
    return out


def scan_to_dataframe(
    spark: SparkSession,
    metadata: TableMetadata,
    snapshot: Snapshot | None,
    predicate: Expr | str | None = None,
    columns: list[str] | None = None,
    use_snapshot_schema: bool = False,
    row_lineage: bool = False,
    metadata_columns: list[str] | None = None,
) -> DataFrame:
    """Current reads use the table's *current* schema (old files surface new
    columns as nulls); time travel (use_snapshot_schema) pins the schema the
    snapshot was written with (table_metadata.rs:155-164).

    ``metadata_columns`` appends Iceberg's reserved metadata columns:
    ``_file`` (data file path), ``_pos`` (row position in its file),
    ``_spec_id`` (partition spec the file was written under) and
    ``_partition`` (the file's partition tuple, as a JSON string — specs of
    different shapes coexist after partition evolution, so one struct type
    cannot represent all files).

    ``row_lineage=True`` appends the Iceberg v3 lineage metadata columns
    ``_row_id`` / ``_last_updated_sequence_number``: explicit values
    physically written into a file (compaction preservation,
    first_row_id=-1) win; otherwise rows inherit
    ``file.first_row_id + row position`` and the file's data sequence
    number. Files from before lineage assignment read NULLs (spec:
    unassigned rows)."""
    if isinstance(predicate, str):
        predicate = parse_predicate(predicate)
    schema = metadata.current_schema()
    if use_snapshot_schema and snapshot is not None:
        schema = metadata.schemas.get(snapshot.schema_id, schema)
    # one manifest-list read serves routing + planning + delete detection,
    # and one entry cache means each manifest is deserialized at most once
    ml_rows = read_manifest_list(snapshot.manifest_list) if snapshot is not None else []
    entry_cache: dict = {}
    # read.planning-mode: auto (default; route by live-file count), or pin
    # driver / distributed — metadata-heavy tables under the threshold can
    # still opt into the mapInPandas planner, and latency-critical readers
    # of huge tables with selective manifest pruning can pin the driver walk
    mode = metadata.properties.get("read.planning-mode", "auto")
    distributed = (
        mode == "distributed"
        if mode in ("driver", "distributed")
        else snapshot_live_file_count(snapshot, ml_rows) > DISTRIBUTED_PLANNING_THRESHOLD
    )
    if distributed:
        files = plan_files_distributed(spark, metadata, snapshot, predicate, ml_rows=ml_rows)
    else:
        files = plan_files(metadata, snapshot, predicate, ml_rows=ml_rows, entry_cache=entry_cache)
    deletes = plan_delete_files(metadata, snapshot, ml_rows=ml_rows, entry_cache=entry_cache)
    # files are READ under the physical schema (v3 variant columns are
    # JSON text on disk) and surfaced logical (parse_json) after the
    # row-address-keyed delete/lineage machinery
    read_schema = schema.physical_spark_schema()
    if row_lineage:
        from pyspark.sql import types as T

        read_schema = T.StructType(
            list(read_schema.fields)
            + [
                T.StructField("_row_id", T.LongType(), True),
                T.StructField("_last_updated_sequence_number", T.LongType(), True),
            ]
        )
    _META_COLS = ("_file", "_pos", "_spec_id", "_partition")
    if metadata_columns:
        bad = [c for c in metadata_columns if c not in _META_COLS]
        if bad:
            raise ValueError(f"unknown metadata columns {bad}; supported: {list(_META_COLS)}")
    # scan-side eq-delete pruning (r10): drop delete files whose key bounds
    # are provably disjoint from EVERY planned (possibly predicate-pruned)
    # data file — a point-lookup on a MoR table then skips the anti-joins
    # entirely instead of paying one per live tombstone. Cost is a driver-
    # side bounds matrix, capped so a 100k-file × 100-delete plan never
    # stalls planning (past the cap the joins stay, correctness unchanged).
    eq_entries_all = [e for e in deletes if e.data_file.content == 2]
    if eq_entries_all and files and len(eq_entries_all) * len(files) <= 2_000_000:
        seqs_prune = data_file_sequence_numbers(
            metadata, snapshot, ml_rows=ml_rows, entry_cache=entry_cache
        )
        _wcache: dict = {}
        eq_entries_all = [
            e
            for e in eq_entries_all
            for prep in (eq_delete_prep(e.data_file, schema),)
            if any(
                e.sequence_number > seqs_prune.get(f.file_path, 0)
                and _eq_can_touch_prepared(prep, f, metadata.schemas, _wcache)
                for f in files
            )
        ]
        deletes = [e for e in deletes if e.data_file.content != 2] + eq_entries_all
    # file-group-local MoR apply (r11): data files NO tombstone can touch
    # read clean — outside the row-address + anti-join machinery, whose
    # cost is a ~2× constant regardless of tombstone count. Skipped when
    # the caller needs row addresses everywhere (lineage/metadata columns).
    clean_files: list = []
    if deletes and len(files) > 1 and not row_lineage and not metadata_columns:
        touched = _mor_touched_files(
            files, deletes, schema, metadata, snapshot, ml_rows, entry_cache
        )
        if touched is not None:
            if not touched:
                deletes = []  # provably nothing to apply
            elif len(touched) < len(files):
                clean_files = [f for f in files if canon_path(f.file_path) not in touched]
                files = [f for f in files if canon_path(f.file_path) in touched]
    lineage = (bool(deletes) or row_lineage or bool(metadata_columns)) and bool(files)
    if not files:
        if metadata_columns:
            from pyspark.sql import types as T

            _meta_types = {
                "_file": T.StringType(),
                "_pos": T.LongType(),
                "_spec_id": T.IntegerType(),
                "_partition": T.StringType(),
            }
            read_schema = T.StructType(
                list(read_schema.fields)
                + [T.StructField(c, _meta_types[c], True) for c in metadata_columns]
            )
        df = local_rows_df(spark, [], read_schema)
    elif len(metadata.schemas) > 1:
        df = _read_with_field_id_resolution(
            spark, metadata, schema, files, lineage=lineage, physical_lineage=row_lineage
        )
    else:
        df = spark.read.schema(read_schema).parquet(*[f.file_path for f in files])
        if lineage:
            df = _with_lineage(df)
    if lineage:
        pos = [e.data_file for e in deletes if e.data_file.content == 1]
        eq = [e for e in deletes if e.data_file.content == 2]
        if eq:
            df = _apply_equality_deletes(
                spark,
                df,
                eq,
                data_file_sequence_numbers(
                    metadata, snapshot, ml_rows=ml_rows, entry_cache=entry_cache
                ),
                schema=schema,
            )
        if pos:
            df = _apply_position_deletes(spark, df, pos)
        if row_lineage:
            df = _attach_row_lineage(
                spark,
                df,
                files,
                data_file_sequence_numbers(
                    metadata, snapshot, ml_rows=ml_rows, entry_cache=entry_cache
                ),
            )
        if metadata_columns:
            df = _attach_metadata_columns(spark, df, files, metadata_columns, metadata)
        df = df.drop("_sg_file", "_sg_pos")
    if clean_files:  # untouched files rejoin OUTSIDE the MoR machinery
        if len(metadata.schemas) > 1:
            clean_df = _read_with_field_id_resolution(
                spark, metadata, schema, clean_files, lineage=False
            )
        else:
            clean_df = spark.read.schema(read_schema).parquet(
                *[f.file_path for f in clean_files]
            )
        df = df.unionByName(clean_df)
    df = _decode_variants(df, schema)
    if predicate is not None:
        df = df.filter(predicate.sql())  # residual filter → Catalyst pushes into Parquet
    if columns:
        extra = []
        if row_lineage:
            extra += ["_row_id", "_last_updated_sequence_number"]
        if metadata_columns:
            extra += list(metadata_columns)
        df = df.select(*columns, *extra)
    # Statistics feed into join planning (reference:
    # datafusion_iceberg/src/statistics.rs:20-100): Spark estimates this
    # relation by raw parquet bytes, which overshoots after MoR deletes or
    # a selective residual predicate. When the manifest/NDV estimate fits
    # the broadcast threshold but the raw bytes do not, hint broadcast —
    # the decision Spark's estimator cannot make. No-op otherwise.
    from iceberg_rust_custom_spark.table.plan_stats import broadcast_threshold, estimate_scan

    total_data_rows = sum(
        r.get("added_rows_count", 0) + r.get("existing_rows_count", 0)
        for r in ml_rows
        if r.get("content", 0) == 0
    )
    all_files = files + clean_files  # the estimate covers BOTH split halves
    _, est_bytes, raw_bytes = estimate_scan(
        metadata, snapshot, all_files, deletes, predicate, total_data_rows=total_data_rows
    )
    thr = broadcast_threshold(spark)
    if all_files and est_bytes <= thr < raw_bytes:
        df = df.hint("broadcast")
    return df


def decode_geo_binary(df: DataFrame, schema: Schema) -> DataFrame:
    """Decode WKB-binary geometry/geography columns into Spark's native geo
    types with the declared SRID. The ONE place the geo decode lives (r10
    review: the CDC reader had its own copy) — the scan's logical surface
    and ``streaming.cdc_source.decode_geo_columns`` both route here.
    No-op on columns already decoded or absent."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    by_name = {f.name: f.dataType for f in df.schema.fields}
    for name in schema.geo_field_names():
        if isinstance(by_name.get(name), T.BinaryType):
            # geo analysis is session-gated in Spark 4; flip the (runtime)
            # conf so a plain scan of a geo table never needs session prep
            df.sparkSession.conf.set("spark.sql.geospatial.enabled", "true")
            want = schema.field_by_name(name).spark_field().dataType
            expr = F.st_geomfromwkb if isinstance(want, T.GeometryType) else F.st_geogfromwkb
            df = df.withColumn(name, F.st_setsrid(expr(F.col(name)), F.lit(want.srid)))
    return df


def _decode_variants(df: DataFrame, schema: Schema) -> DataFrame:
    """Surface the logical view of v3 physical-divergent columns: variant
    columns parse from their JSON-text storage form; geometry/geography
    columns decode from their WKB-binary storage form into Spark's native
    geo types (SRID from the declared CRS); unknown columns (never
    stored) restore as NULL literals in their declared position. No-op on
    tables without any."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    names = schema.variant_field_names()
    unknown = schema.unknown_field_names()
    geo = schema.geo_field_names()
    if not names and not unknown and not geo:
        return df
    by_name = {f.name: f.dataType for f in df.schema.fields}
    for name in names:
        if isinstance(by_name.get(name), T.StringType):
            df = df.withColumn(name, F.parse_json(F.col(name)))
    df = decode_geo_binary(df, schema)
    if unknown:
        for name in unknown:
            if name not in df.columns:
                df = df.withColumn(name, F.lit(None))
        declared = [f.name for f in schema.fields if f.name in df.columns or f.name in unknown]
        extras = [c for c in df.columns if c not in declared]
        df = df.select(*declared, *extras)
    return df


def read_physical(spark, schema: Schema, paths: list[str]) -> DataFrame:
    """Read specific data files under the table's physical schema and
    surface the logical types (variant columns parsed). The drop-in for
    raw ``spark.read.schema(schema.spark_schema()).parquet`` sites —
    byte-identical plan when the schema has no variant columns."""
    df = spark.read.schema(schema.physical_spark_schema()).parquet(*paths)
    return _decode_variants(df, schema)


def read_files_with_lineage(
    spark, metadata, snapshot, files: list, keep_address: bool = False
) -> DataFrame:
    """Read specific live data files with the v3 lineage columns
    materialized (explicit file values win, else inherit first_row_id +
    position). The building block CoW rewrites (DELETE/UPDATE/MERGE) use
    to preserve row identity, per spec "Row Lineage": carried rows keep
    both columns; a rewrite that modifies a row keeps its ``_row_id`` and
    nulls ``_last_updated_sequence_number`` so it inherits the rewriting
    commit's sequence number. ``keep_address=True`` retains the
    ``_sg_file`` / ``_sg_pos`` row address for callers that also need to
    emit position tombstones."""
    schema = metadata.current_schema()
    if len(metadata.schemas) > 1:
        df = _read_with_field_id_resolution(
            spark, metadata, schema, files, lineage=True, physical_lineage=True
        )
    else:
        from pyspark.sql import types as T

        ss = T.StructType(
            list(schema.physical_spark_schema().fields)
            + [
                T.StructField("_row_id", T.LongType(), True),
                T.StructField("_last_updated_sequence_number", T.LongType(), True),
            ]
        )
        df = _with_lineage(spark.read.schema(ss).parquet(*[f.file_path for f in files]))
    df = _attach_row_lineage(
        spark, df, files, data_file_sequence_numbers(metadata, snapshot)
    )
    df = _decode_variants(df, schema)
    return df if keep_address else df.drop("_sg_file", "_sg_pos")


def _attach_metadata_columns(
    spark, df: DataFrame, files: list, metadata_columns: list[str], metadata
) -> DataFrame:
    """Append Iceberg's reserved metadata columns from the row address
    (``_sg_file``/``_sg_pos``) plus a broadcast per-file map for the
    manifest-sourced ones (_spec_id, _partition)."""
    import json as _json

    from pyspark.sql import functions as F

    if "_file" in metadata_columns:
        df = df.withColumn("_file", F.col("_sg_file"))
    if "_pos" in metadata_columns:
        df = df.withColumn("_pos", F.col("_sg_pos"))
    if "_spec_id" in metadata_columns or "_partition" in metadata_columns:
        from iceberg_rust_custom_spark.metadata.manifest import encode_value

        rows = [
            (
                canon_path(f.file_path),
                f.spec_id if f.spec_id is not None else metadata.default_spec_id,
                _json.dumps({k: encode_value(v) for k, v in f.partition.items()}),
            )
            for f in files
        ]
        m = F.broadcast(
            local_rows_df(spark, rows, "file_path string, _spec_id int, _partition string")
        )
        keep = [c for c in ("_spec_id", "_partition") if c in metadata_columns]
        m = m.select("file_path", *keep)
        norm = F.regexp_replace(df["_sg_file"], "^file:/+", "/")
        df = df.join(m, norm == m["file_path"], "left").drop("file_path")
    # surface in the caller's requested order
    data_cols = [c for c in df.columns if c not in metadata_columns]
    return df.select(*data_cols, *metadata_columns)


def _attach_row_lineage(spark, df: DataFrame, files: list, file_seqs: dict) -> DataFrame:
    """Fill the v3 lineage columns: the physical ``_row_id`` /
    ``_last_updated_sequence_number`` values a rewrite materialized into
    the file win (spec: explicit beats inherited); otherwise rows inherit
    ``first_row_id + position`` and the file's data sequence number via a
    broadcast join on the per-file lineage map (the same shape the
    equality-delete sequencing join uses — one tiny build side, zero
    data-side shuffle)."""
    from pyspark.sql import functions as F

    rows = [
        (
            canon_path(f.file_path),
            None if f.first_row_id is None or f.first_row_id == -1 else f.first_row_id,
            file_seqs.get(f.file_path),
        )
        for f in files
    ]
    m = F.broadcast(
        local_rows_df(spark, rows, "file_path string, _sg_frid long, _sg_fseq long")
    )
    norm = F.regexp_replace(df["_sg_file"], "^file:/+", "/")
    df = df.join(m, norm == m["file_path"], "left").drop("file_path")
    df = df.withColumn(
        "_row_id", F.coalesce(F.col("_row_id"), F.col("_sg_frid") + F.col("_sg_pos"))
    ).withColumn(
        "_last_updated_sequence_number",
        F.coalesce(F.col("_last_updated_sequence_number"), F.col("_sg_fseq")),
    )
    return df.drop("_sg_frid", "_sg_fseq")


def _with_lineage(df: DataFrame) -> DataFrame:
    """Expose (file, row-position) via Spark's hidden _metadata columns —
    the engine-native row address position deletes key on."""
    from pyspark.sql import functions as F

    return df.select(
        F.col("_metadata.file_path").alias("_sg_file"),
        F.col("_metadata.row_index").alias("_sg_pos"),
        "*",
    )


import re as _re_mod

# characters the file-URI encoding leaves untouched — safe for comparing
# decoded paths against encoded-domain bounds (see _mor_touched_files).
# ':' is admitted: URI scheme/authority colons are literal, and canon_path
# performs NO percent-decoding on non-file schemes (s3a://…), so there is
# no mixed-domain hazard for them — excluding ':' silently disabled the
# split on exactly the object-store warehouses r11 targets (review r11)
_re_safe_path = _re_mod.compile(r"[A-Za-z0-9._/=:\-]*")


def _mor_touched_files(files, deletes, schema, metadata, snapshot, ml_rows, entry_cache):
    """The subset of planned data files the pending MoR tombstones MAY
    touch, as canon paths — or None when any tombstone lacks addressing
    info (legacy position files without file_path footer bounds) or the
    eq bounds matrix would be planning-cost-prohibitive. Supersets only:
    a false 'touched' merely routes a file through the (correct) MoR
    path.

    This feeds the file-group-local apply (r11, VERDICT r10 #3): the MoR
    machinery costs ~2× a clean read REGARDLESS of tombstone count — the
    per-row address materialization and anti-join stage dominate, not the
    tombstone volume (tools/mor_overhead.py) — so the win is reading
    untouched files entirely OUTSIDE it. Position-delete files carry
    (file_path, pos) footer bounds since r11; DV blobs name their
    referenced file exactly; equality deletes route through the r10
    bounds matrix (eq_victim_candidates)."""
    eq = [e for e in deletes if e.data_file.content == 2]
    pos = [e for e in deletes if e.data_file.content == 1]
    # planning-cost cap, same budget as the r10 eq bounds matrix: past it
    # the split is skipped (correctness unchanged, everything rides MoR)
    if len(files) * max(len(eq), len(pos)) > 2_000_000:
        return None
    touched: set[str] = set()
    if eq:
        seqs = data_file_sequence_numbers(
            metadata, snapshot, ml_rows=ml_rows, entry_cache=entry_cache
        )
        for f in eq_victim_candidates(files, eq, schema, seqs, schemas=metadata.schemas):
            touched.add(canon_path(f.file_path))
    pranges = []
    for e in pos:
        d = e.data_file
        if d.file_format == "puffin":
            if not d.referenced_data_file:
                return None
            touched.add(canon_path(d.referenced_data_file))
            continue
        lo = (d.lower_bounds or {}).get("file_path")
        hi = (d.upper_bounds or {}).get("file_path")
        if lo is None or hi is None:
            return None
        pranges.append((canon_path(lo), canon_path(hi)))
    if pranges:
        # the range test compares CANON (scheme-stripped, percent-DECODED)
        # strings against bounds computed over the tombstones' ENCODED
        # spellings. Decoding is not order-preserving (e.g. '%20' sorts
        # above '!' encoded but ' ' sorts below it decoded), so the
        # bracketing argument only holds when no compared string contains
        # a character URI encoding would rewrite — enforce that with a
        # conservative charset whitelist and fall back to no-split
        # otherwise (review r11; correctness unchanged, everything rides
        # the MoR path)
        safe = _re_safe_path.fullmatch
        if not all(safe(lo) and safe(hi) for lo, hi in pranges):
            return None
        for f in files:
            p = canon_path(f.file_path)
            if p in touched:
                continue
            if not safe(p):
                touched.add(p)  # un-whitelisted path: conservatively dirty
            elif any(lo <= p <= hi for lo, hi in pranges):
                touched.add(p)
    return touched


def _apply_position_deletes(spark, df: DataFrame, deletes: list[DataFile]) -> DataFrame:
    """Merge-on-read: LEFT ANTI join the data stream against the (file, pos)
    delete set. Delete files are tiny next to data, so the build side
    broadcasts (capped — beyond 64 MB of delete files fall back to a
    shuffle join rather than risk driver/executor memory). Tombstones come
    from parquet position-delete files and/or v3-style deletion-vector
    blobs (file_format=puffin) — both decode into the same (file, pos)
    stream and share this one anti-join."""
    from pyspark.sql import functions as F

    parquet_dels = [d for d in deletes if d.file_format != "puffin"]
    dv_dels = [d for d in deletes if d.file_format == "puffin"]
    parts = []
    if parquet_dels:
        # explicit schema: spec position-delete layout — avoids a blocking
        # footer-inference job on every MoR scan
        parts.append(
            spark.read.schema("file_path string, pos long")
            .parquet(*[d.file_path for d in parquet_dels])
            .select("file_path", "pos")
        )
    if dv_dels:
        from iceberg_rust_custom_spark.table.deletion_vectors import dv_positions_df

        parts.append(dv_positions_df(spark, dv_dels))
    del_df = parts[0]
    for p in parts[1:]:
        del_df = del_df.unionByName(p)
    # Broadcast gate: parquet tombstones are sized by file bytes, but a DV
    # run container compresses millions of positions into tens of bytes —
    # gate those on DECODED size (record_count = tombstone cardinality,
    # ~24 B/row as (dict-encoded path ref, pos) in the hash relation), or
    # a tiny-bytes blob could broadcast an enormous position set.
    est_bytes = sum(d.file_size_in_bytes for d in parquet_dels) + sum(
        d.record_count * 24 for d in dv_dels
    )
    if est_bytes < 64 * 1024 * 1024:
        del_df = F.broadcast(del_df)
    cond = (df["_sg_file"] == del_df["file_path"]) & (df["_sg_pos"] == del_df["pos"])
    return df.join(del_df, cond, "left_anti")


def _apply_equality_deletes(
    spark, df: DataFrame, eq_entries: list, file_seqs: dict, schema: Schema | None = None
) -> DataFrame:
    """Equality deletes (content=2): LEFT ANTI join on the delete file's key
    columns, restricted to data rows whose file sequence number is STRICTLY
    OLDER than the delete's — so re-inserting a deleted key resurrects it
    (Iceberg v2 ordering). The delete file's equality_ids (or, for legacy
    files, its own schema) IS its key set; files sharing a key set batch
    into one anti-join."""
    return _equality_deletes_impl(spark, df, eq_entries, file_seqs, schema, how="left_anti")


def equality_delete_hits(
    spark, df: DataFrame, eq_entries: list, file_seqs: dict, schema: Schema | None = None
) -> DataFrame:
    """(_sg_file, _sg_pos) of data rows matched by ANY pending equality
    delete — the SEMI counterpart of ``_apply_equality_deletes``, same
    sequence-number gating. Used by ``rewrite_position_deletes`` to convert
    equality deletes to position form (per-keyset semi-joins unioned, since
    chaining semi-joins would intersect instead of union)."""
    return _equality_deletes_impl(spark, df, eq_entries, file_seqs, schema, how="left_semi")


def equality_delete_hits_with_seq(
    spark, df: DataFrame, eq_entries: list, file_seqs: dict, schema: Schema | None = None
) -> DataFrame:
    """(_sg_file, _sg_pos, _del_seq) of data rows matched by any given
    equality delete, with ``_del_seq`` = the EARLIEST matching delete's
    sequence number — the changelog's victim source: a row emits ONE delete
    event, attributed to the first delete commit that killed it."""
    return _equality_deletes_impl(spark, df, eq_entries, file_seqs, schema, how="hits")


def _equality_deletes_impl(
    spark, df: DataFrame, eq_entries: list, file_seqs: dict, schema: Schema | None, how: str
) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    seq_rows = [(canon_path(p), s) for p, s in file_seqs.items()]
    seq_df = F.broadcast(
        local_rows_df(spark, seq_rows, "file_path string, _sg_dseq long")
    )
    # _metadata.file_path is a file: URI; manifest paths are plain — compare
    # scheme-stripped forms
    norm = F.regexp_replace(df["_sg_file"], "^file:/+", "/")
    df = df.join(seq_df, norm == seq_df["file_path"], "left").drop("file_path")

    id_to_name = {f.field_id: f.name for f in schema.fields} if schema else {}

    def _key_cols(e) -> tuple:
        # equality_ids avoid any file read; legacy files fall back to a
        # driver-side pyarrow footer read (no blocking JVM inference job)
        ids = e.data_file.equality_ids
        if ids and all(i in id_to_name for i in ids):
            return tuple(sorted(id_to_name[i] for i in ids))
        from iceberg_rust_custom_spark.io.fileio import FileIO

        return tuple(
            sorted(FileIO.pq_parquet_file(e.data_file.file_path, spark=spark).schema_arrow.names)
        )

    by_keyset: dict[tuple, list] = {}
    for e in eq_entries:
        by_keyset.setdefault(_key_cols(e), []).append(e)
    # derive the per-keyset read schema through the schema-level physical
    # rendering (ns-long longs, WKB geo, JSON-text variant) — raw
    # NestedField.spark_field() would read an ns-long table's int64 key
    # file under a timestamp schema and break every post-delete scan
    name_to_field = (
        {f.name: f for f in schema.physical_spark_schema().fields} if schema else {}
    )
    semi_parts = []
    for cols, entries in by_keyset.items():
        read_schema = None
        if all(c in name_to_field for c in cols):
            read_schema = T.StructType([name_to_field[c] for c in cols])
        parts = []
        for e in entries:
            rdr = spark.read.schema(read_schema) if read_schema is not None else spark.read
            parts.append(
                rdr.parquet(e.data_file.file_path)
                .select(*cols)
                .withColumn("_sg_eseq", F.lit(e.sequence_number))
            )
        eq_df = parts[0]
        for p in parts[1:]:
            eq_df = eq_df.unionByName(p)
        eq_df = eq_df.select(*[F.col(c).alias(f"_sg_k_{c}") for c in cols], "_sg_eseq")
        if sum(e.data_file.file_size_in_bytes for e in entries) < 64 * 1024 * 1024:
            eq_df = F.broadcast(eq_df)
        cond = eq_df["_sg_eseq"] > df["_sg_dseq"]
        for c in cols:
            cond = cond & df[c].eqNullSafe(eq_df[f"_sg_k_{c}"])
        if how == "left_semi":
            semi_parts.append(df.join(eq_df, cond, "left_semi").select("_sg_file", "_sg_pos"))
        elif how == "hits":
            semi_parts.append(
                df.join(eq_df, cond, "inner").select("_sg_file", "_sg_pos", "_sg_eseq")
            )
        else:
            df = df.join(eq_df, cond, "left_anti")
    if how == "left_semi":
        if not semi_parts:
            return local_rows_df(spark, [], "_sg_file string, _sg_pos long")
        out = semi_parts[0]
        for p in semi_parts[1:]:
            out = out.unionByName(p)
        return out.distinct()
    if how == "hits":
        if not semi_parts:
            return local_rows_df(spark, [], "_sg_file string, _sg_pos long, _del_seq long")
        out = semi_parts[0]
        for p in semi_parts[1:]:
            out = out.unionByName(p)
        return out.groupBy("_sg_file", "_sg_pos").agg(F.min("_sg_eseq").alias("_del_seq"))
    return df.drop("_sg_dseq")


def _project_evolved(col, write_type, cur_type):
    """Project a column written under ``write_type`` onto ``cur_type`` by
    FIELD ID, recursively through structs (the nested half of Iceberg's
    parquet-field-id projection — spec model
    iceberg-rust-spec/src/spec/types.rs:185-344): renamed struct members
    keep their values, members added later null-fill, dropped members
    disappear, and int→long / float→double widen in place. Structs inside
    lists project element-wise via ``transform``; a NULL struct row stays
    NULL (never a struct of nulls). Identical types pass through untouched
    — the common case costs nothing."""
    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.metadata.schema import type_to_spark

    if write_type == cur_type:
        return col
    w_kind = write_type.get("type") if isinstance(write_type, dict) else None
    c_kind = cur_type.get("type") if isinstance(cur_type, dict) else None
    if w_kind == c_kind == "struct":
        wmap = {f["id"]: f for f in write_type["fields"]}
        children = []
        for cf in cur_type["fields"]:
            wf = wmap.get(cf["id"])
            if wf is None:  # member added after these files were written:
                # initial-default (v3) or null-fill
                children.append(
                    F.lit(cf.get("initial-default")).cast(type_to_spark(cf["type"])).alias(cf["name"])
                )
            else:
                children.append(
                    _project_evolved(col[wf["name"]], wf["type"], cf["type"]).alias(cf["name"])
                )
        return F.when(
            col.isNull(), F.lit(None).cast(type_to_spark(cur_type))
        ).otherwise(F.struct(*children))
    if w_kind == c_kind == "list":
        return F.transform(
            col, lambda e: _project_evolved(e, write_type["element"], cur_type["element"])
        )
    if w_kind == c_kind == "map":
        # a struct evolved inside a map key/value must project by field id
        # like the struct/list branches — the fallback cast binds struct
        # members by POSITION and fails outright on added/dropped members
        # (ADVICE r7)
        out = F.transform_values(
            col, lambda _k, v: _project_evolved(v, write_type["value"], cur_type["value"])
        )
        return F.transform_keys(
            out, lambda k, _v: _project_evolved(k, write_type["key"], cur_type["key"])
        )
    return col.cast(type_to_spark(cur_type))


def _read_with_field_id_resolution(
    spark, metadata, schema, files, lineage: bool = False, physical_lineage: bool = False
):
    """Evolved tables: resolve columns by FIELD ID — a file written before
    ``rename_column(a→b)`` physically stores ``a``; reading it under the
    current schema must surface those values as ``b`` (and a later *new*
    field named ``a`` must read as null there, never as b's values).

    Spark-first mechanism: every DataFile records the schema_id it was
    written under; files are grouped by write-schema, each group is read
    with its own physical schema and projected (rename + widen-cast +
    null-fill for later columns) onto the current schema by matching field
    ids, then the per-epoch scans union. Exactly Iceberg's parquet-field-id
    projection, expressed as a plan union instead of a custom data source.
    Legacy files without a recorded schema_id fall back to a conservative
    coalesce over the field's historical names."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from iceberg_rust_custom_spark.metadata.schema import type_to_spark
    from iceberg_rust_custom_spark.metadata.schema_evolution import historical_names

    by_schema: dict[int, list] = {}
    for f in files:
        by_schema.setdefault(f.schema_id, []).append(f)

    _lineage_fields = [
        T.StructField("_row_id", T.LongType(), True),
        T.StructField("_last_updated_sequence_number", T.LongType(), True),
    ]

    def _extend(read_schema: T.StructType) -> T.StructType:
        if not physical_lineage:
            return read_schema
        return T.StructType(list(read_schema.fields) + _lineage_fields)

    parts = []
    for sid, group in by_schema.items():
        paths = [f.file_path for f in group]
        write_schema = metadata.schemas.get(sid)
        if write_schema is not None:
            wfields = {f.field_id: f for f in write_schema.fields}
            df = spark.read.schema(_extend(write_schema.physical_spark_schema())).parquet(*paths)
            exprs = []
            for f in schema.fields:
                wf = wfields.get(f.field_id)
                if f.field_type == "unknown" or (wf is not None and wf.field_type == "unknown"):
                    # v3 unknown: never stored — NULL now; a column PROMOTED
                    # from unknown reads NULL from files written before the
                    # promotion (they hold no values), typed to the new type
                    exprs.append(
                        F.lit(None).cast(type_to_spark(f.field_type)).alias(f.name)
                        if f.field_type != "unknown"
                        else F.lit(None).alias(f.name)
                    )
                elif f.field_type == "variant":
                    # physical JSON text → logical variant (a CAST would
                    # wrap the text as a variant STRING scalar, not parse it)
                    src = (
                        F.col(wf.name)
                        if wf is not None
                        else F.lit(f.initial_default).cast("string")
                    )
                    exprs.append(F.parse_json(src).alias(f.name))
                elif wf is None:  # column added after these files were written:
                    # initial-default (v3) or null-fill
                    exprs.append(
                        F.lit(f.initial_default).cast(type_to_spark(f.field_type)).alias(f.name)
                    )
                else:
                    exprs.append(
                        _project_evolved(F.col(wf.name), wf.field_type, f.field_type).alias(f.name)
                    )
            if physical_lineage:
                exprs = exprs + [F.col("_row_id"), F.col("_last_updated_sequence_number")]
            if lineage:
                exprs = [
                    F.col("_metadata.file_path").alias("_sg_file"),
                    F.col("_metadata.row_index").alias("_sg_pos"),
                ] + exprs
            parts.append(df.select(*exprs))
        else:
            # legacy: no write-schema recorded → coalesce over historical names
            current_names = {f.name for f in schema.fields}
            read_fields: list[T.StructField] = []
            seen: set[str] = set()
            exprs = []
            for f in schema.fields:
                if f.field_type == "unknown":  # never stored → NULL
                    exprs.append(F.lit(None).alias(f.name))
                    continue
                variants = [
                    (name, ftype)
                    for name, ftype in historical_names(metadata, f.field_id)
                    if name == f.name or name not in current_names
                ] or [(f.name, f.field_type)]
                for name, ftype in variants:
                    if name not in seen:
                        seen.add(name)
                        read_fields.append(
                            T.StructField(
                                name,
                                T.StringType() if ftype == "variant" else type_to_spark(ftype),
                                True,
                            )
                        )
                if f.field_type == "variant":
                    cols = [F.parse_json(F.col(name)) for name, _ in variants]
                else:
                    target_type = type_to_spark(f.field_type)
                    cols = [F.col(name).cast(target_type) for name, _ in variants]
                exprs.append((cols[0] if len(cols) == 1 else F.coalesce(*cols)).alias(f.name))
            df = spark.read.schema(_extend(T.StructType(read_fields))).parquet(*paths)
            if physical_lineage:
                exprs = exprs + [F.col("_row_id"), F.col("_last_updated_sequence_number")]
            if lineage:
                exprs = [
                    F.col("_metadata.file_path").alias("_sg_file"),
                    F.col("_metadata.row_index").alias("_sg_pos"),
                ] + exprs
            parts.append(df.select(*exprs))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


MANIFEST_ENTRY_SPARK_SCHEMA = (
    "status int, snapshot_id long, sequence_number long, content int, "
    "file_path string, file_format string, partition string, "
    "record_count long, file_size_in_bytes long, column_sizes string, "
    "value_counts string, null_value_counts string, "
    "lower_bounds string, upper_bounds string, schema_id int"
)


def files_df(
    spark: SparkSession,
    metadata: TableMetadata,
    snapshot: Snapshot | None,
    manifest_paths: list | None = None,
) -> DataFrame:
    """The snapshot's live file entries as a DataFrame read directly from
    the manifest parquets — the distributed planning path.

    Driver-side ``plan_files`` walks manifests in Python, which is right for
    thousands of files; at 100 TB (10^5-10^6 files) the manifest tree itself
    is data, and this scan — a parquet read Spark distributes like any
    other — replaces the walk. Stats columns (partition, bounds, counts)
    come through as JSON for SQL-side filtering. SURVEY §1.7: 'design the
    manifest store as Spark-readable from day one'."""
    from pyspark.sql import functions as F

    if manifest_paths is not None:
        paths = list(manifest_paths)
    elif snapshot is None:
        return local_rows_df(spark, [], MANIFEST_ENTRY_SPARK_SCHEMA)
    else:
        paths = [r["manifest_path"] for r in read_manifest_list(snapshot.manifest_list)]
    if not paths:
        return local_rows_df(spark, [], MANIFEST_ENTRY_SPARK_SCHEMA)
    avro_paths = [p for p in paths if p.endswith(".avro")]
    pq_paths = [p for p in paths if not p.endswith(".avro")]
    parts = []
    if pq_paths:
        parts.append(spark.read.schema(MANIFEST_ENTRY_SPARK_SCHEMA).parquet(*pq_paths))
    if avro_paths:
        # self-describing Avro manifests decoded by the pure-Python OCF
        # reader inside executor tasks (no spark-avro needed)
        from iceberg_rust_custom_spark.metadata.manifest import entry_to_row, read_manifest

        names = [c.split(" ")[0] for c in MANIFEST_ENTRY_SPARK_SCHEMA.split(", ")]

        def decode(batches):
            import pandas as pd

            for pdf in batches:
                rows = []
                for p in pdf["manifest_path"]:
                    for e in read_manifest(p):
                        r = entry_to_row(e)
                        rows.append([r.get(n) for n in names])
                yield pd.DataFrame(rows, columns=names)

        parts.append(
            local_rows_df(spark, [(p,) for p in avro_paths], "manifest_path string")
            .repartition(min(len(avro_paths), 256))
            .mapInPandas(decode, MANIFEST_ENTRY_SPARK_SCHEMA)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.where(F.col("status") != STATUS_DELETED)
