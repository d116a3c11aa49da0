"""MoR read-amplification curve (VERDICT r10 #3).

Between consolidations, every pending delete file costs the scan one
extra anti-join pass. This tool measures the overhead factor directly:
a fixed-size table takes k = 1..N successive MoR delete commits (one
tombstone file each); after each commit the full-scan wall is measured
(median of ``reps``) and compared to the clean-scan wall after
consolidation. Output: one JSON line per k with the factor — the
evidence behind ``write.mv.delete-file-threshold``'s default and the
scan-overhead auto-consolidation bound.

Usage: python tools/mor_overhead.py [rows] [max_files] [reps]
       (defaults: 2_000_000 16 3)
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _scan_wall(t, reps: int) -> float:
    walls = []
    for _ in range(reps):
        t0 = time.perf_counter()
        t.scan().count()
        walls.append(time.perf_counter() - t0)
    return statistics.median(walls)


def main():
    args = sys.argv[1:]
    n_rows = int(args[0]) if len(args) > 0 else 2_000_000
    max_files = int(args[1]) if len(args) > 1 else 16
    reps = int(args[2]) if len(args) > 2 else 3

    from pyspark.sql import functions as F

    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.session import get_spark
    from iceberg_rust_custom_spark.table.maintenance import (
        delete_where,
        rewrite_position_deletes,
    )
    from iceberg_rust_custom_spark.table.scan import plan_delete_files

    spark = get_spark("mor_overhead")
    wh = tempfile.mkdtemp(prefix="morov-")
    eng = Engine(spark, warehouse=wh)
    try:
        t = eng.create_table(
            "ov.t",
            spark.range(1).select(
                F.col("id").alias("k"), (F.col("id") * 1.0).alias("v")
            ).schema,
            # never auto-consolidate mid-sweep
            properties={"write.mv.delete-file-threshold": str(max_files + 100)},
        )
        t.append(
            spark.range(n_rows).select(F.col("id").alias("k"), (F.col("id") * 1.0).alias("v"))
        )
        clean0 = _scan_wall(t, reps)
        rows = []
        for k in range(1, max_files + 1):
            lo = (k - 1) * 200
            t = delete_where(t, f"k >= {lo} AND k < {lo + 200}", mode="merge-on-read")
            n_del = len(plan_delete_files(t.metadata, t.metadata.snapshot_for_ref()))
            wall = _scan_wall(t, reps)
            rows.append({"delete_files": n_del, "scan_s": round(wall, 3)})
        # consolidate: one DV container replaces all parquet tombstones
        t = rewrite_position_deletes(t)
        consolidated = _scan_wall(t, reps)
        n_after = len(plan_delete_files(t.metadata, t.metadata.snapshot_for_ref()))
        base = min(clean0, consolidated)
        for r in rows:
            r["factor"] = round(r["scan_s"] / base, 2)
        print(
            json.dumps(
                {
                    "rows": n_rows,
                    "clean_scan_s": round(clean0, 3),
                    "consolidated_scan_s": round(consolidated, 3),
                    "consolidated_delete_files": n_after,
                    "sweep": rows,
                }
            ),
            flush=True,
        )
    finally:
        try:
            eng.drop("ov.t")
        except Exception:
            pass
        shutil.rmtree(wh, ignore_errors=True)


if __name__ == "__main__":
    main()
