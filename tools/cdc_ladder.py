"""CDC-source scale ladder (VERDICT r8 item 7).

Builds a high-commit-count table (mixed op grammar: appends, MoR position
deletes, equality deletes) WITHOUT Spark — commits are pure driver-side
metadata, which is exactly what the streaming CDC planner consumes — then
measures, at each rung:

* full-log ``partitions(0, head)`` wall time (the batch/catch-up plan),
* steady-state paced planning (one-commit batches, the continuous shape),
* the largest pickled partition (must stay bounded: position lists chunk
  at max_positions_per_partition; eq deletes ship as paths).

Pass criteria: plan time scales ~linearly with commit count (metadata-
proportional — it walks manifests, never data), and no partition pickles
beyond a few hundred KB. Prints one JSON line per rung.

Usage: python tools/cdc_ladder.py [rungs ...]   (default: 100 300 1000)
"""

from __future__ import annotations

import json
import os
import pickle
import shutil
import sys
import tempfile
import time

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_table(wh: str, n_commits: int):
    from iceberg_rust_custom_spark.catalog.base import Identifier
    from iceberg_rust_custom_spark.catalog.file_catalog import FileCatalog
    from iceberg_rust_custom_spark.io.fileio import FileIO
    from iceberg_rust_custom_spark.metadata.manifest import DataFile
    from iceberg_rust_custom_spark.metadata.schema import NestedField, Schema
    from iceberg_rust_custom_spark.metadata.table_metadata import TableMetadata
    from iceberg_rust_custom_spark.table.transaction import Transaction
    from iceberg_rust_custom_spark.table.write import collect_datafile_stats

    schema = Schema(0, (NestedField(1, "k", "long"), NestedField(2, "v", "double")))
    cat = FileCatalog(wh)
    ident = Identifier.parse("lad.t")
    loc = os.path.join(wh, "lad", "t")
    md = TableMetadata.new(loc, schema)
    os.makedirs(md.metadata_dir(), exist_ok=True)
    p0 = os.path.join(md.metadata_dir(), "v0.metadata.json")
    FileIO.write_text(p0, md.to_json())
    cat.register(ident, p0, kind="table")

    data_dir = os.path.join(loc, "data")
    os.makedirs(data_dir, exist_ok=True)
    rows_per_commit = 100
    last_path = None
    for i in range(n_commits):
        tx = Transaction(cat, ident, md)
        kind = i % 10
        if kind == 7 and last_path is not None:
            # MoR position delete: tombstone 5 rows of the previous file
            path = os.path.join(data_dir, f"pd-{i}.parquet")
            pq.write_table(
                pa.table(
                    {"file_path": [last_path] * 5, "pos": list(range(5))}
                ),
                path,
            )
            df = DataFile(
                file_path=path, record_count=5,
                file_size_in_bytes=os.path.getsize(path), content=1,
            )
            md = tx.append_deletes([df]).commit()
        elif kind == 9:
            # equality delete on 3 keys (bounds harvested like delete_by_key)
            path = os.path.join(data_dir, f"eq-{i}.parquet")
            keys = [i * 100 + 1, i * 100 + 2, i * 100 + 3]
            pq.write_table(pa.table({"k": pa.array(keys, pa.int64())}), path)
            import dataclasses as _dc

            stats = collect_datafile_stats(
                path, Schema(0, (schema.fields[0],)), {}, schema_id=0
            )
            md = tx.append_deletes(
                [_dc.replace(stats, content=2, equality_ids=[1])]
            ).commit()
        else:
            path = os.path.join(data_dir, f"d-{i}.parquet")
            base = i * rows_per_commit
            pq.write_table(
                pa.table(
                    {
                        "k": pa.array(range(base, base + rows_per_commit), pa.int64()),
                        "v": pa.array([float(x) for x in range(rows_per_commit)]),
                    }
                ),
                path,
            )
            md = tx.append(
                [collect_datafile_stats(path, schema, {}, schema_id=0)]
            ).commit()
            last_path = path
    return md


def measure(wh: str, head: int) -> dict:
    from iceberg_rust_custom_spark.streaming.cdc_source import (
        IcebergChangelogStreamReader,
    )

    opts = {"warehouse": wh, "table": "lad.t"}
    r = IcebergChangelogStreamReader(opts)
    t0 = time.time()
    off = r.latestOffset()
    t_off = time.time() - t0
    t0 = time.time()
    parts = r.partitions({"seq": 0}, off)
    t_plan = time.time() - t0
    sizes = [len(pickle.dumps(p)) for p in parts]
    # steady state: plan 20 one-commit batches mid-log
    t0 = time.time()
    n_paced = 0
    for s in range(head // 2, min(head // 2 + 20, head - 1)):
        n_paced += len(r.partitions({"seq": s}, {"seq": s + 1}))
    t_paced = (time.time() - t0) / max(1, min(20, head - 1 - head // 2))
    return {
        "commits": head,
        "latest_offset_s": round(t_off, 4),
        "full_plan_s": round(t_plan, 3),
        "partitions": len(parts),
        "max_pickle_kb": round(max(sizes) / 1024, 1),
        "sum_pickle_kb": round(sum(sizes) / 1024, 1),
        "paced_plan_s_per_batch": round(t_paced, 4),
    }


def run_catchup(n_commits: int = 100, rows_per_commit: int = 10_000) -> dict:
    """Catch-up-scale update-pairing rung (VERDICT r10 #5): one follower
    resumes across an UPDATE-HEAVY history in a single batch. Each commit
    MoR-updates ``rows_per_commit`` rows, so the full-range feed carries
    ``n_commits × rows_per_commit`` update pairs — the pairing key set is
    far past the broadcast threshold (16 B/row × 1M ≈ 16 MB > 10 MB), and
    AQE must route the pair join through a SHUFFLE instead of broadcasting
    (the r10 fix removed the hard-coded hint; this measures the case that
    motivated it). Records the catch-up wall and the EXECUTED join shape."""
    import tempfile as _tf

    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.session import get_spark
    from iceberg_rust_custom_spark.streaming.cdc_source import (
        pair_update_events,
        register_cdc_source,
    )
    from iceberg_rust_custom_spark.table.maintenance import update_where

    spark = get_spark("cdc_catchup")
    wh = _tf.mkdtemp(prefix="cdc_catchup_")
    eng = Engine(spark, warehouse=wh)
    try:
        n_rows = n_commits * rows_per_commit
        t = eng.create_table(
            "lad.up",
            spark.range(1).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("amt")).schema,
        )
        t.append(spark.range(n_rows).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("amt")))
        t0 = time.time()
        for i in range(n_commits):
            lo = i * rows_per_commit
            update_where(
                t, {"amt": "amt + 1"}, f"k >= {lo} AND k < {lo + rows_per_commit}",
                mode="merge-on-read",
            )
        build_wall = time.time() - t0
        fmt = register_cdc_source(spark)
        feed = (
            spark.read.format(fmt)
            .option("warehouse", wh)
            .option("table", "lad.up")
            .option("with_lineage", "true")
            .load()
        )
        paired = pair_update_events(feed)
        agg = paired.groupBy("_change_type").count()
        t0 = time.time()
        counts = {r["_change_type"]: r["count"] for r in agg.collect()}
        pair_wall = time.time() - t0
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert counts.get("update_before") == n_commits * rows_per_commit, counts
        assert counts.get("update_after") == n_commits * rows_per_commit, counts
        return {
            "mode": "catchup",
            "commits": n_commits,
            "update_pairs": n_commits * rows_per_commit,
            "history_build_s": round(build_wall, 1),
            "catchup_pair_wall_s": round(pair_wall, 2),
            "shuffle_join_chosen": ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan),
            "broadcast_joins_in_plan": plan.count("BroadcastHashJoin"),
        }
    finally:
        for obj in ("lad.up",):
            try:
                eng.drop(obj)
            except Exception:
                pass
        shutil.rmtree(wh, ignore_errors=True)


def run_follow_join(n_rows: int, n_refreshes: int = 5) -> dict:
    """Changelog-follow rung for JOIN-MV storages (VERDICT r12 #5). r12
    pinned that a pair-keyed storage's delta commits (eq-delete on the
    rid pair + append) are changelog-FOLLOWABLE; this measures that a
    follower's per-batch cost tracks the DELTA, not the storage: a CDC
    follower consumes each refresh's change batch as the fact side grows
    10× per rung, and the follow wall must stay ~flat — the eq-delete
    replay victim-prunes by the tombstones' rid bounds (the storage
    range-clusters on rid_a) instead of re-scanning storage history."""
    import tempfile as _tf

    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.session import get_spark
    from iceberg_rust_custom_spark.table.maintenance import delete_where, update_where

    spark = get_spark("cdc_follow_join")
    wh = _tf.mkdtemp(prefix="cdc_follow_join_")
    eng = Engine(spark, warehouse=wh)
    try:
        n_dim = max(10, n_rows // 10)
        a = eng.create_table(
            "lad.ja",
            spark.range(1).select(
                F.col("id").alias("k"), F.col("id").alias("fk"), (F.col("id") * 1.0).alias("av")
            ).schema,
        )
        a.append(
            spark.range(n_rows).select(
                F.col("id").alias("k"),
                (F.col("id") % n_dim).alias("fk"),
                (F.col("id") * 1.0).alias("av"),
            )
        )
        b = eng.create_table(
            "lad.jb",
            spark.range(1).select(
                F.col("id").alias("fk"), (F.col("id") * 2.0).alias("bv")
            ).schema,
        )
        b.append(spark.range(n_dim).select(F.col("id").alias("fk"), (F.col("id") * 2.0).alias("bv")))
        eng.create_materialized_view(
            "lad.jmv", "SELECT a.k, a.av, b.bv FROM lad.ja a JOIN lad.jb b ON a.fk = b.fk"
        )
        storage = eng.load_table("lad.jmv__storage")
        anchor = storage.metadata.last_sequence_number
        refresh_walls, follow_walls, follow_rows = [], [], []
        next_k = n_rows
        for i in range(n_refreshes):
            lo = i * 100
            delete_where(a, f"k >= {lo} AND k < {lo + 100}", mode="merge-on-read")
            a.append(
                spark.range(100).select(
                    (F.col("id") + next_k).alias("k"),
                    (F.col("id") % n_dim).alias("fk"),
                    (F.col("id") * 1.0).alias("av"),
                )
            )
            next_k += 100
            update_where(
                b, {"bv": "bv + 0.5"}, f"fk >= {i * 10} AND fk < {i * 10 + 10}",
                mode="merge-on-read",
            )
            t0 = time.time()
            flavor = eng.refresh_materialized_view("lad.jmv")
            refresh_walls.append(time.time() - t0)
            assert flavor == "incremental-changelog-join", flavor
            # the follower consumes exactly this refresh's change batch
            storage = eng.load_table("lad.jmv__storage")
            t0 = time.time()
            batch = storage.changes(anchor)
            cnt = batch.count()
            follow_walls.append(time.time() - t0)
            follow_rows.append(cnt)
            anchor = storage.metadata.last_sequence_number
        import statistics

        return {
            "mode": "follow-join",
            "rows_a": n_rows,
            "rows_b": n_dim,
            "refresh_wall_s": round(statistics.median(refresh_walls), 3),
            "follow_wall_s": round(statistics.median(follow_walls), 3),
            "follow_wall_all": [round(w, 3) for w in follow_walls],
            "follow_rows_per_batch": int(statistics.median(follow_rows)),
        }
    finally:
        for obj in ("lad.jmv", "lad.ja", "lad.jb"):
            try:
                eng.drop(obj)
            except Exception:
                pass
        shutil.rmtree(wh, ignore_errors=True)


def main():
    args = sys.argv[1:]
    if "--follow-join" in args:
        nums = [int(a) for a in args if a.isdigit()]
        for n in nums or [10_000, 100_000, 1_000_000]:
            print(json.dumps(run_follow_join(n)), flush=True)
        return
    if "--catchup" in args:
        nums = [int(a) for a in args if a.isdigit()]
        print(
            json.dumps(
                run_catchup(
                    n_commits=nums[0] if nums else 100,
                    rows_per_commit=nums[1] if len(nums) > 1 else 10_000,
                )
            )
        )
        return
    rungs = [int(a) for a in args] or [100, 300, 1000]
    for n in rungs:
        wh = tempfile.mkdtemp(prefix=f"cdc_ladder_{n}_")
        try:
            md = build_table(wh, n)
            out = measure(wh, md.last_sequence_number)
            print(json.dumps(out))
        finally:
            shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
