"""Per-query steady-state profiler for optimization work.

Usage: python tools/profile_queries.py [-n repeats] <query> [query ...]
Primes each query once (codegen + gate-table materialization), then times
`repeats` steady-state executions (same count() action as bench.py) and
prints min/median per query. Honors $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS
like bench.py.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    args = sys.argv[1:]
    repeats = 3
    if args and args[0] == "-n":
        repeats = int(args[1])
        args = args[2:]
    names = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from iceberg_rust_custom_spark.queries import QUERIES
    from iceberg_rust_custom_spark.session import get_spark

    spark = get_spark("profile")
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    spark.range(256).repartition(64).mapInPandas(lambda it: it, "id long").count()

    for name in names:
        fn = QUERIES[name]
        spark.sparkContext.setJobDescription(f"{name}: prime")
        t0 = time.time()
        fn(spark, sf_dir).count()
        cold = time.time() - t0
        samples = []
        for i in range(repeats):
            spark.sparkContext.setJobDescription(f"{name}: run {i}")
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            samples.append(time.time() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: cold={cold:.3f}  min={min(samples):.3f}  "
            f"med={statistics.median(samples):.3f}  rows={n}  samples={[round(s,3) for s in samples]}"
        )


if __name__ == "__main__":
    main()
