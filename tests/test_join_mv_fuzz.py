"""Randomized differential fuzz for the r11 join-MV maintenance stack.

A two-table inner-join MV is driven through random interleavings of
appends, MoR deletes/updates on either source, compactions, and
refreshes; after every refresh the MV content must equal a full
recompute of the view SQL. This exercises the whole r11 surface at
once: pair-lineage eq-delete commits, cross-term netting, equi-join
delta-key arm pruning, rid-trust, storage tombstone consolidation, and
the appends-only/changelog path routing — interactions directed tests
can't enumerate. r12 adds a compound-key variant (``ON a.fk = b.fk AND
a.g = b.g``): the multi-pair arm pruning must never change answers, and
updates MOVE rows between join partners by flipping the second key."""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_rust_custom_spark.engine import Engine
from iceberg_rust_custom_spark.table.maintenance import compact, delete_where, update_where

_op = st.one_of(
    st.tuples(st.just("append_a"), st.integers(1, 4)),
    st.tuples(st.just("append_b"), st.integers(1, 3)),
    st.tuples(st.just("delete_a"), st.integers(0, 9)),
    st.tuples(st.just("delete_b"), st.integers(0, 9)),
    st.tuples(st.just("update_a"), st.integers(0, 9)),
    st.tuples(st.just("update_b"), st.integers(0, 9)),
    st.tuples(st.just("compact_a")),
    st.tuples(st.just("refresh")),
)

_SQL = "SELECT a.k, a.av, b.bv FROM jf.a a JOIN jf.b b ON a.fk = b.fk WHERE a.av <> -1"
_SQL_COMPOUND = (
    "SELECT a.k, a.av, b.bv FROM jf.a a JOIN jf.b b "
    "ON a.fk = b.fk AND a.g = b.g WHERE a.av <> -1"
)


def _run_fuzz(spark, tmp, ops, compound: bool):
    eng = Engine(spark, warehouse=str(tmp / "wh"))
    sql = _SQL_COMPOUND if compound else _SQL
    a_schema_cols = [F.col("id").alias("k"), F.col("id").alias("fk")]
    if compound:
        a_schema_cols.append(F.col("id").alias("g"))
    a_schema_cols.append(F.col("id").alias("av"))
    a = eng.create_table(
        "jf.a",
        spark.range(1).select(*a_schema_cols).schema,
        properties={"write.eq-delete.target-rows": "3", "write.delete.target-rows": "5"},
    )
    b_schema_cols = [F.col("id").alias("fk")]
    if compound:
        b_schema_cols.append(F.col("id").alias("g"))
    b_schema_cols.append(F.col("id").alias("bv"))
    b = eng.create_table("jf.b", spark.range(1).select(*b_schema_cols).schema)
    if compound:
        a.append(
            spark.range(12).select(
                F.col("id").alias("k"),
                (F.col("id") % 6).alias("fk"),
                (F.col("id") % 3).alias("g"),
                (F.col("id") * 10).alias("av"),
            )
        )
        # per fk: one row whose g matches SOME a rows, one that never can
        b.append(
            spark.range(6)
            .select(
                F.col("id").alias("fk"),
                (F.col("id") % 3).alias("g"),
                (F.col("id") * 100).alias("bv"),
            )
            .unionByName(
                spark.range(6).select(
                    F.col("id").alias("fk"), F.lit(99).alias("g"), (F.col("id") * 100 + 1).alias("bv")
                )
            )
        )
    else:
        a.append(
            spark.range(12).select(
                F.col("id").alias("k"), (F.col("id") % 6).alias("fk"), (F.col("id") * 10).alias("av")
            )
        )
        b.append(spark.range(6).select(F.col("id").alias("fk"), (F.col("id") * 100).alias("bv")))
    eng.create_materialized_view("jf.mv", sql)
    next_k, next_fk = 1000, 6

    def check():
        got = sorted(
            (r.k, r.av, r.bv) for r in eng.scan_materialized_view("jf.mv").collect()
        )
        want = sorted((r.k, r.av, r.bv) for r in eng.sql(sql).collect())
        assert got == want, (ops,)

    for op in ops:
        kind = op[0]
        if kind == "append_a":
            n = op[1]
            if compound:
                a.append(
                    spark.createDataFrame(
                        [
                            (next_k + i, (next_k + i) % 6, (next_k + i) % 3, (next_k + i) * 10)
                            for i in range(n)
                        ],
                        "k long, fk long, g long, av long",
                    )
                )
            else:
                a.append(
                    spark.createDataFrame(
                        [(next_k + i, (next_k + i) % 6, (next_k + i) * 10) for i in range(n)],
                        "k long, fk long, av long",
                    )
                )
            next_k += n
        elif kind == "append_b":
            n = op[1]
            if compound:
                b.append(
                    spark.createDataFrame(
                        [(next_fk + i, (next_fk + i) % 3, (next_fk + i) * 100) for i in range(n)],
                        "fk long, g long, bv long",
                    )
                )
            else:
                b.append(
                    spark.createDataFrame(
                        [(next_fk + i, (next_fk + i) * 100) for i in range(n)],
                        "fk long, bv long",
                    )
                )
            next_fk += n
        elif kind == "delete_a":
            delete_where(a, f"k % 10 = {op[1]}", mode="merge-on-read")
        elif kind == "delete_b":
            delete_where(b, f"fk % 10 = {op[1]}", mode="merge-on-read")
        elif kind == "update_a":
            # some updates land rows IN/OUT of the view's WHERE clause;
            # in the compound variant, others MOVE rows between join
            # partners by flipping the second key
            if op[1] % 3 == 0:
                update_where(a, {"av": "-1"}, f"k % 10 = {op[1]}", mode="merge-on-read")
            elif compound and op[1] % 3 == 1:
                update_where(a, {"g": "(g + 1) % 3"}, f"k % 10 = {op[1]}", mode="merge-on-read")
            else:
                update_where(a, {"av": "av + 1"}, f"k % 10 = {op[1]}", mode="merge-on-read")
        elif kind == "update_b":
            update_where(b, {"bv": "bv + 7"}, f"fk % 10 = {op[1]}", mode="merge-on-read")
        elif kind == "compact_a":
            compact(a)
        elif kind == "refresh":
            eng.refresh_materialized_view("jf.mv")  # False = already fresh
            check()
    # final refresh: whatever is pending must land exactly
    eng.refresh_materialized_view("jf.mv")
    check()
    for obj in ("jf.mv", "jf.a", "jf.b"):
        try:
            eng.drop(obj)
        except Exception:
            pass


@pytest.mark.slow
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op, min_size=4, max_size=9))
@pytest.mark.slow
def test_join_mv_random_op_sequences_match_recompute(spark, tmp_path_factory, ops):
    _run_fuzz(spark, tmp_path_factory.mktemp("jfz"), ops, compound=False)


@pytest.mark.slow
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op, min_size=4, max_size=9))
@pytest.mark.slow
def test_compound_key_join_mv_random_op_sequences_match_recompute(
    spark, tmp_path_factory, ops
):
    _run_fuzz(spark, tmp_path_factory.mktemp("jfzc"), ops, compound=True)
