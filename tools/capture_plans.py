"""Capture .explain('formatted') for headline queries into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt (suffix from $SPARK_GRAFT_PLAN_SUFFIX,
default "before"). Gate queries (iceberg_*) build their /tmp warehouse as a
side effect on first call; the captured plan is the returned DataFrame's —
the read/refresh the bench times.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")

    from iceberg_rust_custom_spark.queries import QUERIES
    from iceberg_rust_custom_spark.session import get_spark

    if not names:
        import bench

        names = list(bench.HEADLINE)

    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    for name in names:
        try:
            df = QUERIES[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR capturing plan: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)", file=sys.stderr)


if __name__ == "__main__":
    main()
