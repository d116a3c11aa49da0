"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query smoke check at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md §2): each
                 callable (spark, sf_dir) -> DataFrame.
oracle_sql()   — matching DuckDB SQL per query (omitted only for the
                 genuinely approximate ops: IVF probing, LSH bucketing —
                 those get the driver's rows-only check).

Implementations live in iceberg_rust_custom_spark/queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from iceberg_rust_custom_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-shape pricing summary (the reference's canonical
    aggregate evidence) over sf0.001."""
    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
