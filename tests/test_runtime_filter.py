"""Runtime join-key file pruning (table/runtime_filter.py, Table.join_scan).

The invariant under test: join_scan(dim, on=...) returns EXACTLY the rows of
scan().join(dim, on) for inner/semi shapes, while planning strictly fewer
files when the dim's key range is selective.
"""

import pytest
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.metadata.expressions import (
    AlwaysFalse,
    Comparison,
    may_match,
)
from iceberg_rust_custom_spark.table.runtime_filter import join_key_predicate


@pytest.fixture(scope="module")
def fact_table(spark, tmp_path_factory):
    """Orders-like fact clustered on custkey so files carry tight key
    ranges — the shape where a runtime filter pays."""
    eng = Engine(spark, warehouse=str(tmp_path_factory.mktemp("rfwh")))
    df = spark.range(0, 20_000).select(
        F.col("id").alias("o_id"),
        (F.col("id") % 500).alias("custkey"),
        (F.col("id") * 7 % 1000).cast("double").alias("price"),
    )
    t = eng.create_table(
        "rf.orders",
        df.schema,
        properties={"write.distribution-mode": "range", "write.range-partitions": "8"},
        sort_by=["custkey"],
    )
    t.append(df)
    return t


def test_in_set_predicate_prunes_and_matches(spark, fact_table):
    dim = spark.createDataFrame([(3,), (7,), (490,)], "custkey int")
    pred = join_key_predicate(dim, "custkey")
    assert isinstance(pred, Comparison) and pred.op == "in"
    assert fact_table.count_planned_files(pred) < fact_table.count_planned_files()

    got = fact_table.join_scan(dim, "custkey").select("o_id", "custkey", "price")
    want = fact_table.scan().join(F.broadcast(dim), "custkey").select("o_id", "custkey", "price")
    assert sorted(got.collect()) == sorted(want.collect())


def test_range_predicate_above_max_keys(spark, fact_table):
    # cardinality above max_keys → BETWEEN min/max shape, still prunes a
    # clustered fact when the dim covers a narrow band
    dim = spark.range(0, 60).select(F.col("id").cast("int").alias("custkey"))
    pred = join_key_predicate(dim, "custkey", max_keys=10)
    assert not isinstance(pred, Comparison)  # And(>=, <=)
    assert fact_table.count_planned_files(pred) < fact_table.count_planned_files()
    got = fact_table.join_scan(dim, "custkey", max_keys=10)
    assert got.count() == fact_table.scan().join(dim, "custkey").count()


def test_semi_join_and_column_mapping(spark, fact_table):
    dim = spark.createDataFrame([(11, "x"), (13, "y")], "c_custkey int, seg string")
    got = fact_table.join_scan(dim, {"custkey": "c_custkey"}, how="semi")
    want = fact_table.scan().where(F.col("custkey").isin(11, 13))
    assert sorted(r.o_id for r in got.collect()) == sorted(r.o_id for r in want.collect())
    assert got.columns == fact_table.scan().columns  # semi keeps fact schema


def test_empty_dim_plans_zero_files(spark, fact_table):
    empty = spark.createDataFrame([], "custkey int")
    assert isinstance(join_key_predicate(empty, "custkey"), AlwaysFalse)
    assert fact_table.count_planned_files(join_key_predicate(empty, "custkey")) == 0
    assert fact_table.join_scan(empty, "custkey").count() == 0


def test_all_null_keys_match_nothing(spark, fact_table):
    dim = spark.createDataFrame([(None,), (None,)], "custkey int")
    assert isinstance(join_key_predicate(dim, "custkey"), AlwaysFalse)


def test_null_keys_ignored_in_probe(spark, fact_table):
    dim = spark.createDataFrame([(5,), (None,)], "custkey int")
    pred = join_key_predicate(dim, "custkey")
    assert pred == Comparison("custkey", "in", (5,))
    got = fact_table.join_scan(dim, "custkey")
    # inner equi-join: the NULL dim row matches nothing
    assert got.select("custkey").distinct().collect() == [
        fact_table.spark.createDataFrame([(5,)], "custkey int").collect()[0]
    ]


def test_outer_join_rejected(spark, fact_table):
    dim = spark.createDataFrame([(1,)], "custkey int")
    with pytest.raises(ValueError, match="unsound"):
        fact_table.join_scan(dim, "custkey", how="left")


def test_always_false_prunes_everything():
    assert may_match(AlwaysFalse(), None) is False


def test_scan_report_counters(spark, fact_table):
    rep_all = fact_table.scan_report()
    assert rep_all["files_planned"] == rep_all["files_scanned"] > 1
    assert rep_all["manifests_pruned"] == 0
    assert rep_all["rows_planned"] == 20_000 and rep_all["bytes_planned"] > 0
    rep = fact_table.scan_report("custkey < 50")
    assert rep["files_planned"] < rep_all["files_planned"]
    assert rep["rows_planned"] < rep_all["rows_planned"]


def test_join_scan_applies_mor_deletes(spark, tmp_path):
    """Runtime-filtered scans go through the same delete-applying read path:
    rows tombstoned by a merge-on-read delete must not resurface."""
    from iceberg_rust_custom_spark.table.maintenance import delete_where

    eng = Engine(spark, warehouse=str(tmp_path / "wh"))
    df = spark.range(0, 1000).select(
        F.col("id").alias("o_id"), (F.col("id") % 50).alias("custkey")
    )
    t = eng.create_table(
        "rf.mor", df.schema, properties={"write.delete.mode": "merge-on-read"}
    )
    t.append(df)
    delete_where(t, "o_id >= 500")
    dim = spark.createDataFrame([(7,), (9,)], "custkey bigint")
    got = sorted(r.o_id for r in t.join_scan(dim, "custkey").collect())
    want = sorted(i for i in range(500) if i % 50 in (7, 9))
    assert got == want
