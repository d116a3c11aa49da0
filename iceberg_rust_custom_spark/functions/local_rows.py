"""Driver-local rows → DataFrame via Arrow, skipping the Python-RDD path.

``spark.createDataFrame(list_of_tuples, schema)`` routes through
``applySchemaToPythonRDD``: every action on the frame (and on every plan
that joins it — e.g. the broadcast file→sequence maps inside each MoR
scan) runs a ``Scan ExistingRDD`` stage that pickles rows through a Python
worker. Measured on the r14 harness box: ~0.7 s per count() for a 16-row
map vs ~0.15 s via an Arrow table, which lands as a pure-JVM
``LocalTableScan`` (guide §4: eliminate the JVM↔Python boundary; §6 Arrow
for driver transfers). These tiny driver-known maps are on the hot path of
every iceberg_* gate query, so the fixed cost repeats per scan.

``local_rows_df`` converts through ``pyarrow.Table`` when the rows/schema
allow it and silently falls back to the classic path otherwise (exotic
types such as variant/geometry, struct values carried as Row objects, …) —
results are identical either way, only the execution plan of the local
relation changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """``spark.createDataFrame(rows, schema)`` preferring the Arrow
    local-table route. ``rows``: iterable of tuples/Rows; ``schema``: a
    StructType or DDL string."""
    rows = list(rows)
    try:
        import pyarrow as pa
        from pyspark.sql.pandas.types import to_arrow_schema

        st = schema if isinstance(schema, T.StructType) else T.StructType.fromDDL(schema)
        tbl = pa.Table.from_pylist(
            [dict(zip(st.names, r)) for r in rows], schema=to_arrow_schema(st)
        )
        return spark.createDataFrame(tbl)
    except Exception:
        return spark.createDataFrame(rows, schema)
