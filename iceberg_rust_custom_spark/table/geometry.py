"""Partition-space rectangle geometry for append manifest selection.

Reference: iceberg-rust/src/util/mod.rs:14-134 (Rectangle: expand,
cmp_with_priority via per-dimension try_sub) as used by
table/transaction/append.rs:96-141 (select_manifest_partitioned): when
appending to a PARTITIONED table, the target manifest is the one whose
partition bounding rectangle grows the LEAST after merging in the new
batch's rectangle — earlier spec dimensions weigh more (lexicographic
extent comparison). This keeps each manifest spatially tight in partition
space, which is what makes manifest-list FieldSummary pruning selective
once a table accumulates many manifests. Unpartitioned tables (and any
candidate whose bounds are unreadable or non-subtractable) fall back to
the smallest-manifest rule (append.rs:143-181
select_manifest_unpartitioned).
"""

from __future__ import annotations

import datetime as _dt
import json


def try_sub(left, right):
    """Per-value subtraction yielding a comparable 'extent'
    (util/mod.rs:128-134; Value::try_sub semantics). Raises TypeError for
    types without a meaningful difference (strings, bools, bytes) — the
    caller falls back to smallest-manifest selection, as the reference
    propagates the error."""
    if left is None or right is None:
        raise TypeError("cannot subtract None partition bounds")
    if isinstance(left, bool) or isinstance(right, bool):
        raise TypeError("boolean partition values have no extent")
    if isinstance(left, _dt.datetime) and isinstance(right, _dt.datetime):
        return (left - right).total_seconds()
    if isinstance(left, _dt.date) and isinstance(right, _dt.date):
        return (left - right).days
    if isinstance(left, (int, float)) and isinstance(right, (int, float)):
        return left - right
    raise TypeError(f"no extent for partition value types {type(left)}/{type(right)}")


class Rectangle:
    """Axis-aligned bounding box over the partition-spec dimensions, in
    spec-field order (util/mod.rs:14-79)."""

    __slots__ = ("min", "max")

    def __init__(self, mins: list, maxs: list):
        self.min = list(mins)
        self.max = list(maxs)

    def expand(self, other: "Rectangle") -> None:
        """Grow to include ``other`` (util/mod.rs:24-37)."""
        for i in range(len(self.min)):
            if other.min[i] < self.min[i]:
                self.min[i] = other.min[i]
            if other.max[i] > self.max[i]:
                self.max[i] = other.max[i]

    def cmp_with_priority(self, other: "Rectangle") -> int:
        """-1/0/1 comparison of per-dimension extents, earlier dimensions
        prioritized (util/mod.rs:53-79): the first dimension whose extents
        differ decides."""
        for i in range(len(self.min)):
            own = try_sub(self.max[i], self.min[i])
            oth = try_sub(other.max[i], other.min[i])
            if own < oth:
                return -1
            if own > oth:
                return 1
        return 0


def entries_rectangle(entries, field_names: list[str]) -> Rectangle | None:
    """Bounding rectangle of the new batch's partition tuples
    (append.rs:64-77 bounding_partition_values via expand_with_node).
    None when any value is missing/NaN/non-comparable — caller falls back."""
    mins: list = []
    maxs: list = []
    first = True
    for e in entries:
        vals = []
        for name in field_names:
            v = e.data_file.partition.get(name)
            if v is None or (isinstance(v, float) and v != v):
                return None
            vals.append(v)
        if first:
            mins, maxs = list(vals), list(vals)
            first = False
        else:
            for i, v in enumerate(vals):
                if v < mins[i]:
                    mins[i] = v
                if v > maxs[i]:
                    maxs[i] = v
    if first:
        return None
    return Rectangle(mins, maxs)


def summary_to_rectangle(
    summaries: dict, field_names: list[str], result_types: dict
) -> Rectangle | None:
    """Manifest-list FieldSummary JSON → Rectangle (util/mod.rs:93-114).
    None when any dimension lacks bounds (the reference errors; we fall
    back to smallest-manifest selection)."""
    from iceberg_rust_custom_spark.metadata.manifest import decode_value

    mins, maxs = [], []
    for name in field_names:
        s = summaries.get(name) or {}
        lo, hi = s.get("lower"), s.get("upper")
        if lo is None or hi is None:
            return None
        t = result_types.get(name, "string")
        mins.append(decode_value(lo, t))
        maxs.append(decode_value(hi, t))
    return Rectangle(mins, maxs)


def select_manifest_partitioned(
    candidates: list[dict], batch_rect: Rectangle, field_names: list[str], result_types: dict
) -> dict | None:
    """The candidate manifest-list row whose rectangle, expanded with the
    batch's rectangle, is smallest under priority comparison
    (append.rs:96-141; first wins ties, as the reference keeps the current
    selection on Ordering::Equal). None → caller falls back to the
    smallest-manifest rule."""
    best = None
    best_rect = None
    try:
        for row in candidates:
            summaries = json.loads(row.get("partitions") or "{}")
            rect = summary_to_rectangle(summaries, field_names, result_types)
            if rect is None:
                return None
            rect.expand(batch_rect)
            if best is None or best_rect.cmp_with_priority(rect) > 0:
                best, best_rect = row, rect
    except TypeError:
        return None
    return best
