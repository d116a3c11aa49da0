"""Table transactions: Append / Rewrite / metadata-only ops + commit.

Mirrors the reference's transaction machinery
(iceberg-rust/src/table/transaction/mod.rs:25-193, operation.rs:91-585):

* ``Append`` — routes new DataFiles into manifests. The reference balances
  manifests toward ``4 + sqrt(total_files)`` entries each, picking the
  best-fit manifest by partition-bounds growth (operation.rs:34,592-610;
  append.rs:96-181). Round 4 reproduces both: the sqrt-law sizing AND the
  partition-rectangle least-growth target selection (table/geometry.py ↔
  util/mod.rs:14-134) on partitioned tables, with smallest-manifest
  fallback for unpartitioned tables or non-subtractable partition types
  (append.rs:143-181).
* ``Rewrite`` — replaces the whole file set (compaction / overwrite-all;
  operation.rs:378-552): all old snapshots removed, replaced files
  physically deleted after a successful commit (table/mod.rs:216-269).
* Commit — requirement-checked CAS via the catalog with a bounded retry
  loop on fresh metadata (the reference CASes but never retries —
  transaction/mod.rs:148-191; retry is our improvement, noted in SURVEY §7 M7).
"""

from __future__ import annotations

import math
import os
import time
import uuid as _uuid

from iceberg_rust_custom_spark.catalog.base import Catalog, CommitFailed, Identifier
from iceberg_rust_custom_spark.metadata.manifest import (
    STATUS_ADDED,
    STATUS_EXISTING,
    DataFile,
    ManifestEntry,
    read_manifest,
    read_manifest_list,
    write_manifest,
    write_manifest_list,
)
from iceberg_rust_custom_spark.metadata.snapshot import (
    MAIN_BRANCH,
    Snapshot,
    SnapshotReference,
    generate_snapshot_id,
)
from iceberg_rust_custom_spark.io.fileio import FileIO
from iceberg_rust_custom_spark.metadata.table_metadata import CommitConflict, TableMetadata

MIN_DATAFILES_PER_MANIFEST = 4  # reference: operation.rs:34


def _manifest_size_limit(total_files: int) -> int:
    # reference compute_n_splits / sqrt law (operation.rs:592-610)
    return MIN_DATAFILES_PER_MANIFEST + int(math.isqrt(max(total_files, 0)))


def _infer_spec_id(data_file: DataFile, metadata: TableMetadata) -> int:
    """The partition spec a data file's partition tuple was written under.

    The authoritative source is ``data_file.spec_id``, threaded from the
    manifest-list row at read time (read_manifest) and stamped at write
    time (write_partitioned) — key-set inference is ambiguous for
    parameterized transforms (bucket[4] vs bucket[8] over one column
    generate the same field name, so after a parameter-only evolution the
    tie silently resolved to the wrong spec; ADVICE r4). Key-set matching
    remains only as a fallback for externally constructed DataFiles.
    Prefers the default spec on ties; unmatched key sets fall back to the
    default spec — safe because write_manifest drops FieldSummary bounds
    for any field not present in EVERY entry."""
    if data_file.spec_id is not None and data_file.spec_id in metadata.partition_specs:
        return data_file.spec_id
    keys = frozenset(data_file.partition.keys())
    default_id = metadata.default_spec_id
    default_spec = metadata.partition_specs.get(default_id)
    if default_spec is not None and keys == frozenset(pf.name for pf in default_spec.fields):
        return default_id
    for sid in sorted(metadata.partition_specs):
        if keys == frozenset(pf.name for pf in metadata.partition_specs[sid].fields):
            return sid
    return default_id


class Transaction:
    def __init__(self, catalog: Catalog, identifier: Identifier, metadata: TableMetadata, branch: str = MAIN_BRANCH):
        self.catalog = catalog
        self.identifier = identifier
        self.base = metadata
        self.branch = branch
        self._appends: list[DataFile] = []
        self._rewrite: list[DataFile] | None = None
        self._retain_history = False
        self._extra_updates: list[dict] = []
        self._summary_extra: dict = {}
        self._operation = "append"
        self._force_snapshot = False
        # v3 row lineage: data files whose first_row_id this transaction
        # assigns. Captured once so a commit RETRY re-assigns the same
        # files from the refreshed metadata's next-row-id — reusing a
        # stale block would collide with a concurrent committer's rows.
        self._assign_row_ids: list[DataFile] | None = None

    # ------------------------------------------------------------ operations
    def append(self, files: list[DataFile]) -> "Transaction":
        self._appends.extend(files)
        return self

    def append_deletes(self, files: list[DataFile]) -> "Transaction":
        """Add position-delete files (content=1) — merge-on-read DELETE.
        Routed through the same manifest machinery as data appends, but the
        snapshot operation is 'delete' so downstream consumers (incremental
        MV refresh's appends-only gate) treat it as a row-changing commit."""
        self._appends.extend(files)
        self._operation = "delete"
        return self

    def append_with_lineage(self, files: list[DataFile], refresh_state: dict) -> "Transaction":
        """Append carrying MV RefreshState — incremental refresh commits
        deltas without rewriting the storage table (the reference only has
        the rewrite flavor; its incremental path is an unimplemented
        placeholder — materialized_view.rs:147-159)."""
        self._appends.extend(files)
        self._summary_extra["refresh-state"] = refresh_state
        return self

    def touch(self) -> "Transaction":
        """Commit a snapshot with NO file changes: every existing manifest
        carries forward into a fresh manifest list. The way to stamp a
        summary payload (e.g. an MV RefreshState) without moving data —
        the previous rewrite-the-same-file-set approach rebuilt the
        snapshot from DATA files only, silently dropping pending MoR
        delete files and resurrecting deleted rows (r9, caught by the
        bounded-history MV test)."""
        self._force_snapshot = True
        return self

    def set_summary(self, extra: dict) -> "Transaction":
        """Attach extra key/values to the snapshot summary (e.g. streaming
        sink lineage — sink id + micro-batch id — for exactly-once replay
        detection, the Delta-style txn appId/version pattern)."""
        self._summary_extra.update(extra)
        return self

    def set_operation(self, op: str) -> "Transaction":
        """Override the snapshot summary operation for append-shaped commits
        (e.g. merge-on-read MERGE = deletes + appends in one snapshot →
        'overwrite', so append-only consumers know rows changed)."""
        self._operation = op
        return self

    def rewrite(self, files: list[DataFile], retain_history: bool = False) -> "Transaction":
        """Replace the entire visible file set (compaction / overwrite).

        ``retain_history=False`` (the reference's behavior,
        table/mod.rs:216-269): all prior snapshots are removed and their
        data/manifest files physically deleted after the commit — use only
        when no other branch/tag pins them. ``retain_history=True`` commits
        a plain overwrite snapshot on top of the current head: prior
        snapshots, refs and files stay intact (time travel keeps working;
        expire_snapshots/vacuum reclaim space later)."""
        self._rewrite = list(files)
        self._retain_history = retain_history
        return self

    def rewrite_with_lineage(self, files: list[DataFile], refresh_state: dict) -> "Transaction":
        """Rewrite carrying MV RefreshState in the snapshot summary
        (reference: transaction/mod.rs:97-121)."""
        self._rewrite = list(files)
        self._summary_extra["refresh-state"] = refresh_state
        return self

    def set_properties(self, updates: dict) -> "Transaction":
        self._extra_updates.append({"action": "set-properties", "updates": updates})
        return self

    def remove_properties(self, removals: list[str]) -> "Transaction":
        self._extra_updates.append({"action": "remove-properties", "removals": removals})
        return self

    def add_schema(self, schema) -> "Transaction":
        self._extra_updates.append({"action": "add-schema", "schema": schema.to_dict()})
        return self

    def set_current_schema(self, schema_id: int) -> "Transaction":
        self._extra_updates.append({"action": "set-current-schema", "schema-id": schema_id})
        return self

    def update_spec(self, spec) -> "Transaction":
        """Partition evolution: register a new spec and make it the default
        (reference models this as AddPartitionSpec + SetDefaultSpec commit
        updates — catalog/commit.rs:303-317 — but never wires an API to it).
        Existing data files keep their old spec; only new writes use this
        one. Scan planning prunes each manifest with the spec it was written
        under."""
        self._extra_updates.append({"action": "add-spec", "spec": spec.to_dict()})
        self._extra_updates.append({"action": "set-default-spec", "spec-id": spec.spec_id})
        return self

    def update_sort_order(self, order) -> "Transaction":
        """Register a new sort order and make it the write default (the
        reference stores sort orders — sort.rs:17-68 — but has no API to
        change them). Applies to subsequent writes only; existing files
        keep their layout until compaction rewrites them."""
        self._extra_updates.append({"action": "add-sort-order", "sort-order": order.to_dict()})
        self._extra_updates.append({"action": "set-default-sort-order", "order-id": order.order_id})
        return self

    def set_ref(self, name: str, snapshot_id: int, ref_type: str = "branch") -> "Transaction":
        self._extra_updates.append(
            {
                "action": "set-snapshot-ref",
                "ref-name": name,
                "reference": SnapshotReference(snapshot_id, ref_type).to_dict(),
            }
        )
        return self

    def remove_snapshots(self, snapshot_ids: list[int]) -> "Transaction":
        self._extra_updates.append({"action": "remove-snapshots", "snapshot-ids": list(snapshot_ids)})
        return self

    # ---------------------------------------------------------------- commit
    def commit(self, max_retries: int = 4) -> TableMetadata:
        """Build snapshot + manifests, then requirement-checked CAS with
        bounded retries on fresh metadata."""
        metadata = self.base
        last_err: Exception | None = None
        for attempt in range(max_retries + 1):
            try:
                return self._commit_once(metadata)
            except (CommitFailed, CommitConflict) as e:
                last_err = e
                # refresh and retry: appends are re-routable onto any base
                location, _ = self.catalog.load(self.identifier)
                metadata = TableMetadata.from_json(FileIO.read_text(location))
                if self._rewrite is not None:
                    # rewrites replace specific files; retrying blindly could
                    # drop concurrent appends → surface the conflict
                    raise
                time.sleep(0.05 * (attempt + 1))
        raise last_err  # type: ignore[misc]

    def _commit_once(self, metadata: TableMetadata) -> TableMetadata:
        updates: list[dict] = []
        requirements: list[dict] = []
        ref = metadata.refs.get(self.branch)
        parent = metadata.snapshot_for_ref(self.branch)
        requirements.append(
            {
                "type": "assert-ref-snapshot-id",
                "ref": self.branch,
                "snapshot-id": ref.snapshot_id if ref else (parent.snapshot_id if parent else None),
            }
        )

        if self._appends or self._rewrite is not None or self._force_snapshot:
            # v3 row lineage: reserve [next_row_id, next_row_id + rows) for
            # new data files; carried files keep their block, files marked
            # -1 carry explicit _row_id columns (compaction preservation)
            incoming = self._appends + (self._rewrite or [])
            if self._assign_row_ids is None:
                self._assign_row_ids = [
                    f for f in incoming if f.content == 0 and f.first_row_id is None
                ]
            nxt = metadata.next_row_id
            for f in self._assign_row_ids:
                f.first_row_id = nxt
                nxt += f.record_count
            if nxt > metadata.next_row_id:
                updates.append({"action": "set-next-row-id", "next-row-id": nxt})
            seq = metadata.last_sequence_number + 1
            snap_id = generate_snapshot_id()
            meta_dir = metadata.metadata_dir()
            if "://" not in meta_dir:  # non-local schemes create on write (FileIO)
                os.makedirs(meta_dir, exist_ok=True)

            if self._rewrite is not None:
                # Destructive rewrite would remove snapshots pinned by OTHER
                # branches/tags and physically delete their data (dangling
                # refs + data loss — ADVICE r4). If any other ref exists,
                # fall back to history-retaining overwrite; ref-aware
                # expire_snapshots reclaims space later.
                if any(name != self.branch for name in metadata.refs):
                    self._retain_history = True
                manifest_rows = self._build_rewrite_manifests(metadata, meta_dir, snap_id, seq)
                summary = {
                    "operation": "overwrite",
                    "added-data-files": str(len(self._rewrite)),
                    # distinguishes a FILE-SET REPLACEMENT from append-shaped
                    # commits that merely set operation='overwrite' (MoR
                    # UPDATE/MERGE): the changelog can replay the latter
                    # row-by-row but not a rewrite (table.py::changes)
                    "rewritten": "true",
                    **self._summary_extra,
                }
                if not self._retain_history:
                    updates.append(
                        {"action": "remove-snapshots", "snapshot-ids": list(metadata.snapshots.keys())}
                    )
            else:
                manifest_rows = self._build_append_manifests(metadata, parent, meta_dir, snap_id, seq)
                summary = {
                    "operation": self._operation,
                    "added-data-files": str(len(self._appends)),
                    **self._summary_extra,
                }

            from iceberg_rust_custom_spark.metadata.avro_manifest import manifest_ext

            ext = manifest_ext(metadata.properties)
            ml_path = os.path.join(meta_dir, f"snap-{snap_id}.manifest-list{ext}")
            write_manifest_list(
                ml_path,
                manifest_rows,
                schema=metadata.current_schema(),
                specs=metadata.partition_specs,
            )
            snapshot = Snapshot(
                snapshot_id=snap_id,
                sequence_number=seq,
                timestamp_ms=int(time.time() * 1000),
                manifest_list=ml_path,
                summary=summary,
                schema_id=metadata.current_schema_id,
                parent_snapshot_id=parent.snapshot_id if parent else None,
            )
            updates.append({"action": "add-snapshot", "snapshot": snapshot.to_dict()})
            updates.append(
                {
                    "action": "set-snapshot-ref",
                    "ref-name": self.branch,
                    "reference": SnapshotReference(snap_id).to_dict(),
                }
            )

        updates.extend(self._extra_updates)
        if not updates:
            return metadata

        # REST-protocol catalogs apply {requirements, updates} server-side
        # (CommitTableRequest); pointer catalogs return None and take the
        # classic load-fresh → check → apply → CAS path below.
        committed = self.catalog.commit_updates(self.identifier, requirements, updates)
        if committed is not None:
            new_metadata = committed
        else:
            # Requirements were derived from the base this transaction
            # planned against; they must hold on the *current* catalog state
            # at commit time (commit.rs:53-184). Load fresh, check, apply, CAS.
            current_location, _ = self.catalog.load(self.identifier)
            current = TableMetadata.from_json(FileIO.read_text(current_location))
            current.check_requirements(requirements)
            new_metadata = current.apply_updates(updates)

            # write v{N}.metadata.json and CAS the catalog pointer
            meta_dir = new_metadata.metadata_dir()
            new_path = os.path.join(meta_dir, f"v{_uuid.uuid4().hex[:12]}.metadata.json")
            FileIO.write_text(new_path, new_metadata.to_json())
            self.catalog.swap(self.identifier, current_location, new_path)

        if self._rewrite is not None and not self._retain_history:
            self._delete_replaced_files(metadata)
        return new_metadata

    # -------------------------------------------------------------- builders
    def _build_append_manifests(self, metadata, parent, meta_dir, snap_id, seq) -> list[dict]:
        from iceberg_rust_custom_spark.metadata.avro_manifest import manifest_ext

        existing_rows = read_manifest_list(parent.manifest_list) if parent else []
        total_files = sum(
            r["added_files_count"] + r["existing_files_count"] for r in existing_rows
        ) + len(self._appends)
        limit = _manifest_size_limit(total_files)

        ext = manifest_ext(metadata.properties)
        spec_id = metadata.default_spec_id
        schema = metadata.current_schema()
        spec = metadata.default_spec()

        new_entries = [ManifestEntry(STATUS_ADDED, snap_id, seq, f) for f in self._appends]
        if ext == ".avro":
            # spec v2: data and delete files live in SEPARATE manifests
            # (manifest.rs:125-170 "content" file metadata) — split; Parquet
            # manifests keep one mixed stream (engine-native, content is a
            # per-entry column there)
            groups = [
                g
                for g in (
                    [e for e in new_entries if e.data_file.content == 0],
                    [e for e in new_entries if e.data_file.content != 0],
                )
                if g
            ]
        else:
            groups = [new_entries] if new_entries else []

        rows: list[dict] = []
        consumed: list[dict] = []

        def _write(entries, path):
            row = write_manifest(path, entries, spec_id, schema, spec)
            row["added_snapshot_id"] = snap_id
            return row

        # best-fit: merge into an existing same-spec manifest if it stays
        # within the sqrt-law limit; otherwise start new manifest(s).
        # Only same-spec manifests are merge candidates — a manifest's
        # partition tuples are decoded with ONE spec at scan time, so mixing
        # specs inside a manifest would corrupt pruning after evolution.
        #
        # Target choice (append.rs:96-181): PARTITIONED tables pick the
        # manifest whose partition-space bounding rectangle grows least when
        # the batch's rectangle is merged in (keeps manifests spatially
        # tight → FieldSummary pruning stays selective at high manifest
        # counts); unpartitioned tables — and any candidate without usable
        # rectangle bounds — pick the smallest manifest.
        from iceberg_rust_custom_spark.table.geometry import (
            entries_rectangle,
            select_manifest_partitioned,
        )

        spec_field_names = [pf.name for pf in spec.fields] if spec else []
        result_types: dict = {}
        for pf in spec.fields if spec else ():
            try:
                src = schema.field_by_id(pf.source_id)
            except KeyError:
                continue
            tname = src.field_type if isinstance(src.field_type, str) else "string"
            result_types[pf.name] = pf.transform.result_type(tname)

        candidates = [r for r in existing_rows if r.get("partition_spec_id", 0) == spec_id]
        for group in groups:
            is_data = group[0].data_file.content == 0
            merged = False
            if is_data and candidates:
                smallest = None
                if spec_field_names:
                    batch_rect = entries_rectangle(group, spec_field_names)
                    if batch_rect is not None:
                        smallest = select_manifest_partitioned(
                            candidates, batch_rect, spec_field_names, result_types
                        )
                if smallest is None:
                    smallest = min(
                        candidates,
                        key=lambda r: r["added_files_count"] + r["existing_files_count"],
                    )
                if (
                    smallest["added_files_count"] + smallest["existing_files_count"] + len(group)
                    <= limit
                ):
                    carried = [
                        ManifestEntry(STATUS_EXISTING, e.snapshot_id, e.sequence_number, e.data_file)
                        for e in read_manifest(smallest["manifest_path"], smallest)
                        if e.status != 2
                    ]
                    # an avro data manifest cannot absorb carried deletes
                    if ext != ".avro" or all(e.data_file.content == 0 for e in carried):
                        consumed.append(smallest)
                        candidates = [r for r in candidates if r is not smallest]
                        path = os.path.join(meta_dir, f"manifest-{_uuid.uuid4().hex[:12]}{ext}")
                        rows.append(_write(carried + group, path))
                        merged = True
            if not merged:
                for chunk_start in range(0, len(group), max(limit, 1)):
                    chunk = group[chunk_start : chunk_start + max(limit, 1)]
                    path = os.path.join(meta_dir, f"manifest-{_uuid.uuid4().hex[:12]}{ext}")
                    rows.append(_write(chunk, path))
        rows.extend(r for r in existing_rows if not any(r is c for c in consumed))
        return rows

    def _build_rewrite_manifests(self, metadata, meta_dir, snap_id, seq) -> list[dict]:
        from iceberg_rust_custom_spark.metadata.avro_manifest import manifest_ext

        ext = manifest_ext(metadata.properties)
        schema = metadata.current_schema()
        # Carried (untouched) files keep their ORIGINAL data sequence number
        # (annotated at manifest read); only freshly written files take this
        # commit's. Iceberg semantics: a rewrite adds no rows, so carried
        # files must not look new to incremental readers, eq-delete
        # ordering, or inherit-mode row lineage.
        entries = [
            ManifestEntry(
                STATUS_ADDED,
                snap_id,
                f.data_sequence_number if f.data_sequence_number is not None else seq,
                f,
            )
            for f in self._rewrite or []
        ]
        # A manifest's partition tuples are decoded with ONE spec at scan
        # time, so a rewrite that carries files written under an OLDER spec
        # (CoW delete/update/merge keep untouched files) must keep them in
        # manifests of THEIR spec: mixing specs let write_manifest build a
        # FieldSummary claiming bounds an old-spec file never had, and
        # manifest-level pruning then dropped it (fuzz catch, round 4).
        by_spec: dict[int, list] = {}
        for e in entries:
            by_spec.setdefault(_infer_spec_id(e.data_file, metadata), []).append(e)
        limit = _manifest_size_limit(len(entries))
        rows = []
        for sid in sorted(by_spec) or [metadata.default_spec_id]:
            group = by_spec.get(sid, [])
            spec = metadata.partition_specs.get(sid, metadata.default_spec())
            chunks = [
                group[start : start + max(limit, 1)] for start in range(0, len(group), max(limit, 1))
            ] or [[]]
            for chunk in chunks:
                path = os.path.join(meta_dir, f"manifest-{_uuid.uuid4().hex[:12]}{ext}")
                row = write_manifest(path, chunk, sid, schema, spec)
                row["added_snapshot_id"] = snap_id
                rows.append(row)
        return rows

    def _delete_replaced_files(self, old_metadata: TableMetadata) -> None:
        """Physically delete data files of replaced snapshots after a
        successful rewrite commit (reference: table/mod.rs:216-269)."""
        keep = {f.file_path for f in self._rewrite or []}
        for snap in old_metadata.snapshots.values():
            try:
                for row in read_manifest_list(snap.manifest_list):
                    for e in read_manifest(row["manifest_path"]):
                        p = e.data_file.file_path
                        if p not in keep and os.path.exists(p):
                            os.remove(p)  # data files: written by Spark, local/s3a
                    # manifests/manifest lists go through FileIO so cleanup
                    # also reaches s3://-hosted metadata (write.metadata.path)
                    if FileIO.exists(row["manifest_path"]):
                        FileIO.delete(row["manifest_path"])
                if FileIO.exists(snap.manifest_list):
                    FileIO.delete(snap.manifest_list)
            except FileNotFoundError:
                pass
