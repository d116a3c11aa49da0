"""Mergeable-sketch aggregates: HLL distinct counting and KLL quantiles.

The scale story for COUNT(DISTINCT) and exact percentiles is bad: both
need a full shuffle of the distinct values / the whole column. Mergeable
sketches replace them with bounded-size state that composes under union —
the same algebraic property that makes partial aggregation, incremental
maintenance, and cross-partition rollups cheap:

* per-partition sketch → one small shuffle of fixed-size binaries,
* old sketch ∪ delta sketch == sketch of the union (incremental MV shape
  for approx-distinct metrics: maintain the SKETCH column, estimate at
  read time),
* per-day sketches roll up to month/year without touching raw data.

Built on Spark's Apache DataSketches bindings (hll_sketch_agg /
hll_union_agg, kll_sketch_agg_* / kll_sketch_merge_*) — JVM-side,
whole-stage-codegen aggregates, no UDFs. The reference exposes
DataFusion's approx_distinct/approx_percentile the same delegated way
(datafusion-iceberg-sql/src/context.rs:58); sketch *mergeability across
snapshots* is beyond it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hll_partials(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 12
) -> DataFrame:
    """Per-group HLL sketch of ``value_col``: (group_cols…, hll_sketch).
    This is the stored/partial form — keep it in a metrics table and merge
    later instead of re-scanning raw data."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lgk)).alias("hll_sketch")
    )


def hll_merge_estimate(
    partials: DataFrame, group_cols: list[str], out_col: str = "approx_distinct"
) -> DataFrame:
    """Union per-group sketches (e.g. per-day partials rolled up to the
    coarser ``group_cols``) and estimate: (group_cols…, approx_distinct)."""
    return partials.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("hll_sketch")).alias(out_col)
    )


def incremental_distinct(
    stored: DataFrame, delta_partials: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold a delta's sketches into stored ones WITHOUT re-reading history:
    sketch(A ∪ Δ) == union(sketch(A), sketch(Δ)). Returns the new stored
    form — the approx-distinct analogue of partial-aggregate MV merge."""
    return (
        stored.unionByName(delta_partials)
        .groupBy(*group_cols)
        .agg(F.hll_union_agg("hll_sketch").alias("hll_sketch"))
    )


def kll_quantile_partials(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 200
) -> DataFrame:
    """Per-group KLL quantile sketch over a double column."""
    return df.groupBy(*group_cols).agg(
        F.kll_sketch_agg_double(F.col(value_col).cast("double"), F.lit(k)).alias("kll_sketch")
    )


def kll_merge_quantiles(
    partials: DataFrame, group_cols: list[str], quantiles: list[float]
) -> DataFrame:
    """Merge per-group KLL sketches to the coarser grouping and read out
    quantiles: (group_cols…, q_<fraction>…)."""
    # kll_sketch_merge_double is a binary scalar (no aggregate form in
    # Spark's API): fold the group's sketches pairwise. Sketch count per
    # group = the coarser-rollup fan-in (days per month), driver-safe.
    merged = (
        partials.groupBy(*group_cols)
        .agg(F.collect_list("kll_sketch").alias("_sks"))
        .withColumn(
            "kll_sketch",
            F.aggregate(
                F.slice("_sks", 2, F.greatest(F.size("_sks") - 1, F.lit(0))),
                F.element_at("_sks", 1),
                lambda acc, x: F.kll_sketch_merge_double(acc, x),
            ),
        )
        .drop("_sks")
    )
    cols = [
        F.kll_sketch_get_quantile_double("kll_sketch", F.lit(q)).alias(
            f"q_{str(q).replace('.', '_')}"
        )
        for q in quantiles
    ]
    return merged.select(*group_cols, *cols)


# ---------------------------------------------------------------------------
# Count-min sketch (deterministic, cross-engine verifiable)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_buckets(col: str, depth: int, width: int):
    """array<struct<d, bucket>> of a value's CMS coordinates — the ONE place
    the hash family (md5-affine, seed 0xC0FFEE) is defined, shared by sketch
    build and probe so they cannot drift apart."""
    from iceberg_rust_custom_spark.functions.hashing import (
        affine_hash_sql,
        md5h32_spark_sql,
        minhash_params,
    )

    h0 = md5h32_spark_sql(col)
    return F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                F.expr(f"{affine_hash_sql(h0, a, b)} % {width}").cast("int").alias("bucket"),
            )
            for d, (a, b) in enumerate(minhash_params(depth, seed=0xC0FFEE))
        ]
    )


def cms_table(
    df: DataFrame, token_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Count-min sketch of a token stream as a (d, bucket, cnt) DataFrame —
    ``depth × width`` counters total, independent of corpus size.

    Counters are SUMS, so the sketch is mergeable by addition across
    partitions, shards, and snapshots (union two sketches = union the
    frames + re-sum), the same algebra HLL/KLL ride. Unlike library
    sketches, every hash here is the engine's md5-affine family
    (functions/hashing.py) — DETERMINISTIC and SQL-expressible, so a CMS
    built by Spark and one built by the DuckDB oracle agree cell-for-cell
    (the driver gate can hash-match a sketch, not just eyeball it).
    """
    return (
        df.select(F.explode(_cms_buckets(token_col, depth, width)).alias("db"))
        .groupBy(F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame, terms: DataFrame, term_col: str, depth: int = CMS_DEPTH, width: int = CMS_WIDTH
) -> DataFrame:
    """Point-estimate term frequencies from a CMS: for each term, min over
    its depth counters (the classic CMS upper-bound estimate). The sketch
    side is depth×width rows → broadcast; the join never touches raw data."""
    probes = terms.select(
        F.col(term_col), F.explode(_cms_buckets(term_col, depth, width)).alias("db")
    ).select(term_col, F.col("db.d").alias("d"), F.col("db.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(term_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_count"))
    )


# ---------------------------------------------------------------------------
# Deterministic HLL: cross-engine BIT-EXACT approximate distinct
# ---------------------------------------------------------------------------

def det_hll_sql(value_expr: str, lgk: int = 10) -> dict:
    """SQL fragments (valid in BOTH Spark SQL and DuckDB) for a
    deterministic HyperLogLog over md5-derived 32-bit hashes. Unlike
    DataSketches HLL (whose estimate depends on engine internals), every
    intermediate here is an INTEGER — register index, rank (via
    ``length(bin(w))``), and the harmonic sum ``Σ 2^(B+1-M_j)`` computed in
    BIGINT — so Spark and any ANSI engine produce the SAME estimate to the
    last bit. One float division (+ ln in the linear-counting branch) at
    the very end. Returns {"reg", "rho", "estimate"} fragments;
    ``estimate`` expects columns ``_s`` (present-register harmonic sum) and
    ``_p`` (present-register count)."""
    from iceberg_rust_custom_spark.functions.hashing import md5h32_sql

    m = 1 << lgk
    B = 32 - lgk
    alpha = 0.7213 / (1 + 1.079 / m)  # inlined identically on both sides
    h = md5h32_sql(value_expr)
    reg = f"({h} % {m})"
    w = f"CAST(floor({h} / {m}) AS BIGINT)"
    rho = f"(CASE WHEN {w} = 0 THEN {B + 1} ELSE {B} - length(bin({w})) + 1 END)"
    # single precomputed float numerator: alpha·m²·2^(B+1) — a python float
    # repr parses as DOUBLE in both engines (a decimal literal would be
    # DECIMAL in DuckDB and overflow the integer multiply)
    num = float(alpha * m * m * (2 ** (B + 1)))
    denom = f"(_s + ({m} - _p) * CAST({2 ** (B + 1)} AS BIGINT))"
    est = (
        f"CASE WHEN {num!r} / {denom} <= {2.5 * m!r} AND _p < {m} "
        f"THEN ROUND({m} * LN({m} * 1.0 / ({m} - _p)), 4) "
        f"ELSE ROUND({num!r} / {denom}, 4) END"
    )
    return {"reg": reg, "rho": rho, "estimate": est, "B": B, "m": m}


def det_hll_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, lgk: int = 10
) -> DataFrame:
    """Approximate COUNT(DISTINCT value) per group, deterministic across
    engines, partitionings, and cluster sizes — the property that lets the
    DuckDB oracle hash-match an *approximate* aggregate. Two map-side-
    combined shuffles: (group, register) max-rank, then one row per group.
    Standard HLL error ~1.04/√2^lgk (≈3.3% at lgk=10)."""
    from iceberg_rust_custom_spark.functions.hashing import md5h32_spark_sql

    frags = det_hll_sql(f"CAST({value_col} AS STRING)", lgk)
    B, m = frags["B"], frags["m"]
    # hash ONCE into a column with the single-md5 Spark spelling — the
    # portable polynomial inlined into reg AND rho would run md5 16× per
    # row (hashing.py::md5h32_spark_sql rationale); the oracle keeps the
    # portable fragments, values are identical
    h = md5h32_spark_sql(f"CAST({value_col} AS STRING)")
    regs = (
        df.where(F.col(value_col).isNotNull())
        .selectExpr(*group_cols, f"{h} AS _h")
        .selectExpr(
            *group_cols,
            f"(_h % {m}) AS _reg",
            f"(CASE WHEN CAST(floor(_h / {m}) AS BIGINT) = 0 THEN {B + 1} "
            f"ELSE {B} - length(bin(CAST(floor(_h / {m}) AS BIGINT))) + 1 END) AS _rho",
        )
        .groupBy(*group_cols, "_reg")
        .agg(F.max("_rho").alias("_m"))
    )
    per_group = regs.groupBy(*group_cols).agg(
        F.sum(F.expr(f"CAST(pow(2, {B + 1} - _m) AS BIGINT)")).alias("_s"),
        F.count("*").alias("_p"),
    )
    return per_group.selectExpr(*group_cols, f"{frags['estimate']} AS approx_distinct")
