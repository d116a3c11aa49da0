"""Plan-time scan statistics fed into Spark's join planning.

Analogue of the reference's ``DataFusionTable::statistics``
(datafusion_iceberg/src/statistics.rs:20-100), which hands
manifest-derived ``num_rows`` / ``total_byte_size`` / per-column stats to
DataFusion's optimizer. Spark has no API to attach external statistics to
an in-memory DataFrame, but it DOES honor broadcast hints — so the engine
makes the one decision Spark's file-size estimator cannot:

* after **MoR deletes**, Spark sees the raw parquet bytes of the data
  files (the anti-joined tombstones don't shrink its estimate), so a dim
  that fits the broadcast threshold post-delete gets sort-merged;
* after a **selective predicate or runtime join filter**, the planned
  files may still exceed the threshold even though the matching rows —
  estimated from manifest ``record_count``, per-file bounds and HLL-NDV
  (``table/statistics.py``, ANALYZE) — are tiny.

``estimate_scan`` computes (est_rows, est_bytes, raw_bytes) from the
planned file set; ``scan_to_dataframe`` applies ``df.hint("broadcast")``
exactly when ``est_bytes <= autoBroadcastJoinThreshold < raw_bytes`` —
i.e. only where our estimate beats Spark's, never overriding a decision
Spark would already make. Selectivity math is classic CBO: equality → 1/NDV,
IN(k) → k/NDV, numeric ranges → linear interpolation over the file-stat
min/max envelope, AND → product, OR → capped sum, unknown → 1.0
(conservative: no hint).
"""

from __future__ import annotations

from iceberg_rust_custom_spark.metadata.expressions import (
    AlwaysFalse,
    AlwaysTrue,
    And,
    Comparison,
    Expr,
    IsNan,
    IsNull,
    Not,
    Or,
)

_DEFAULT_EQ_SEL = 0.1  # equality with no NDV available
_DEFAULT_RANGE_SEL = 0.3  # non-interpolable range


def ndv_from_metadata(metadata, snapshot) -> dict[str, int]:
    """Per-column NDV from the nearest analyzed ancestor's statistics entry
    (blob properties — no stats-file read needed). Empty dict when the
    table was never ANALYZEd."""
    if snapshot is None or not getattr(metadata, "statistics", None):
        return {}
    by_snap = {e["snapshot-id"]: e for e in metadata.statistics}
    cur = snapshot
    while cur is not None:
        entry = by_snap.get(cur.snapshot_id)
        if entry is not None:
            out = {}
            for b in entry.get("blob-metadata", []):
                try:
                    out[b["fields"][0]] = int(b["properties"]["ndv"])
                except (KeyError, ValueError, IndexError):
                    continue
            return out
        cur = (
            metadata.snapshots.get(cur.parent_snapshot_id)
            if cur.parent_snapshot_id is not None
            else None
        )
    return {}


def _column_envelope(files, column):
    """(lo, hi) across the planned files' footer bounds, or None."""
    lo = hi = None
    for f in files:
        flo, fhi = f.lower_bounds.get(column), f.upper_bounds.get(column)
        if flo is None or fhi is None:
            return None  # any file without bounds → envelope unknown
        lo = flo if lo is None or flo < lo else lo
        hi = fhi if hi is None or fhi > hi else hi
    return None if lo is None else (lo, hi)


def _range_fraction(lo, hi, op, lit) -> float | None:
    """Fraction of [lo, hi] selected by ``col <op> lit`` under a uniform
    assumption; numeric columns only."""
    try:
        lo_f, hi_f, lit_f = float(lo), float(hi), float(lit)
    except (TypeError, ValueError):
        return None
    if hi_f <= lo_f:
        return 1.0
    frac = (lit_f - lo_f) / (hi_f - lo_f)
    frac = min(1.0, max(0.0, frac))
    return frac if op in ("<", "<=") else 1.0 - frac


def selectivity(predicate: Expr | None, files, ndv: dict) -> float:
    """Estimated fraction of planned-file rows matching ``predicate``."""
    if predicate is None or isinstance(predicate, AlwaysTrue):
        return 1.0
    if isinstance(predicate, AlwaysFalse):
        return 0.0
    if isinstance(predicate, And):
        return selectivity(predicate.left, files, ndv) * selectivity(
            predicate.right, files, ndv
        )
    if isinstance(predicate, Or):
        return min(
            1.0,
            selectivity(predicate.left, files, ndv)
            + selectivity(predicate.right, files, ndv),
        )
    if isinstance(predicate, Not):
        return max(0.0, 1.0 - selectivity(predicate.child, files, ndv))
    if isinstance(predicate, (IsNull, IsNan)):
        return 1.0  # null/NaN fractions vary wildly; stay conservative
    if isinstance(predicate, Comparison):
        n = ndv.get(predicate.column)
        if predicate.op == "=":
            return 1.0 / n if n else _DEFAULT_EQ_SEL
        if predicate.op == "in":
            lit = predicate.literal
            k = len(lit) if hasattr(lit, "__len__") else 1
            return min(1.0, k / n) if n else min(1.0, k * _DEFAULT_EQ_SEL)
        if predicate.op in ("<", "<=", ">", ">="):
            env = _column_envelope(files, predicate.column)
            if env is not None:
                frac = _range_fraction(env[0], env[1], predicate.op, predicate.literal)
                if frac is not None:
                    return frac
            return _DEFAULT_RANGE_SEL
        if predicate.op == "!=":
            return max(0.0, 1.0 - (1.0 / n if n else _DEFAULT_EQ_SEL))
    return 1.0


def estimate_scan(
    metadata,
    snapshot,
    files,
    deletes,
    predicate: Expr | None = None,
    total_data_rows: int | None = None,
) -> tuple[int, int, int]:
    """(est_rows, est_bytes, raw_bytes) for a planned scan.

    raw_bytes is what Spark's estimator sees (sum of planned parquet file
    sizes); est_* subtract MoR tombstones (each position/equality-delete
    row assumed to kill one data row) and scale by predicate selectivity.

    Tombstones reference files table-wide, but ``files`` may be a PRUNED
    subset — subtracting every delete row from a pruned scan could falsely
    zero the estimate and broadcast a large side. When
    ``total_data_rows`` (the snapshot's full data row count) is supplied,
    the subtraction is scaled by the planned fraction (uniform-delete
    assumption); without it the unscaled subtraction is only safe on
    unpruned scans."""
    raw_rows = sum(f.record_count for f in files)
    raw_bytes = sum(f.file_size_in_bytes for f in files)
    if raw_rows == 0:
        return 0, 0, raw_bytes
    del_rows = sum(
        e.data_file.record_count for e in (deletes or []) if e.data_file.content in (1, 2)
    )
    if total_data_rows and total_data_rows > raw_rows:
        del_rows = int(del_rows * (raw_rows / total_data_rows))
    live = max(0, raw_rows - del_rows)
    sel = selectivity(predicate, files, ndv_from_metadata(metadata, snapshot))
    est_rows = int(live * sel)
    est_bytes = int(raw_bytes * (est_rows / raw_rows))
    return est_rows, est_bytes, raw_bytes


def broadcast_threshold(spark) -> int:
    """spark.sql.autoBroadcastJoinThreshold in bytes (-1 → disabled → 0)."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")).strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30), ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30), ("b", 1)):
        if raw.endswith(suffix):
            raw, mult = raw[: -len(suffix)], m
            break
    try:
        v = int(raw) * mult
    except ValueError:
        return 10 << 20
    return max(0, v)
