"""Runtime join-key file pruning — the dynamic-partition-pruning analogue.

Spark's built-in DPP only fires for Hive-style partitioned reads planned
inside one query; engine scans hand Spark an explicit pruned file list, so
the equivalent runs at PLAN time: probe the (small, already-filtered)
dimension side ONCE for its join-key value set or range, convert that into
a scan predicate, and let the existing two-level pruning stack — manifest
FieldSummary, file min/max, per-file bloom — drop fact files before Spark
ever reads them. The reference reaches the same effect through
DataFusion's PruningPredicate evaluated against file statistics
(datafusion_iceberg/src/pruning_statistics.rs:32-218); driving it from the
dim side of a join is the natural extension once deletes/joins are real.

Why this matters at 100 TB: ``orders ⋈ (customer WHERE segment =
'BUILDING' AND nation = 'KENYA')`` needs only the order files whose
``o_custkey`` stats overlap the few thousand surviving customers. Without
a runtime filter the fact scan reads everything and the join discards
>99% of it after the shuffle; with it the discard happens in metadata.

Two probe shapes, chosen by the dim's observed key cardinality:

* **IN-set** (≤ ``max_keys`` distinct keys): the exact key set becomes an
  ``IN`` predicate — file min/max AND bloom sketches both prune, and the
  residual ``IN`` pushes into the Parquet row-group scan. Exact-match
  power, bounded plan size.
* **range** (above ``max_keys``): per-key ``BETWEEN min AND max`` — sound
  for any cardinality, still prunes when the fact table is clustered or
  partitioned on the key.

NULL join keys never match an equi-join, so both shapes ignore them.
An EMPTY dim side collapses the scan to zero files (``AlwaysFalse``).

The residual predicate is row-level sound only for inner/semi joins
(every fact row it removes has no join partner); ``join_scan`` therefore
refuses outer/anti shapes rather than silently corrupt them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.metadata.expressions import (
    AlwaysFalse,
    And,
    Comparison,
    Expr,
)

DEFAULT_MAX_KEYS = 10_000


def _normalize_on(on) -> list[tuple[str, str]]:
    """on: 'col' | ['a', 'b'] | {fact_col: dim_col} → [(fact, dim), …]."""
    if isinstance(on, str):
        return [(on, on)]
    if isinstance(on, dict):
        return list(on.items())
    return [(c, c) if isinstance(c, str) else tuple(c) for c in on]


def join_key_predicate(
    dim_df: DataFrame, on, fact_cols: dict | None = None, max_keys: int = DEFAULT_MAX_KEYS
) -> Expr:
    """Probe ``dim_df`` for its join-key values and return a scan predicate
    over the fact columns.

    One aggregate job collects per-key (min, max, approx distinct); keys
    whose observed cardinality fits under ``max_keys`` get a second tiny
    job collecting the exact distinct set (cap enforced with LIMIT — an
    approx_count_distinct underestimate cannot overflow the plan). Cost is
    O(dim), which is the side a runtime filter is worth probing by
    construction."""
    pairs = _normalize_on(on)
    aggs = []
    for _, dc in pairs:
        aggs += [
            F.min(dc).alias(f"_mn_{dc}"),
            F.max(dc).alias(f"_mx_{dc}"),
            F.approx_count_distinct(dc).alias(f"_nd_{dc}"),
        ]
    row = dim_df.agg(*aggs).first().asDict()

    pred: Expr | None = None
    for fc, dc in pairs:
        mn, mx = row[f"_mn_{dc}"], row[f"_mx_{dc}"]
        if mn is None:  # dim empty, or every key NULL → nothing can join
            return AlwaysFalse()
        # approx_count_distinct is ±~2.3%; scale the cutoff so a slight
        # underestimate still routes to the exact-set probe, and the LIMIT
        # below guards the plan size regardless
        if row[f"_nd_{dc}"] <= max_keys * 1.05:
            vals = [
                r[0]
                for r in dim_df.select(dc).where(F.col(dc).isNotNull()).distinct()
                .limit(max_keys + 1).collect()
            ]
            if len(vals) <= max_keys:
                p: Expr = Comparison(fc, "in", tuple(sorted(vals)))
            else:
                p = And(Comparison(fc, ">=", mn), Comparison(fc, "<=", mx))
        else:
            p = And(Comparison(fc, ">=", mn), Comparison(fc, "<=", mx))
        pred = And(pred, p) if pred is not None else p
    return pred if pred is not None else AlwaysFalse()
