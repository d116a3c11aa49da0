"""Randomized differential fuzz for the r11 join-MV maintenance stack.

A two-table inner-join MV is driven through random interleavings of
appends, MoR deletes/updates on either source, compactions, and
refreshes; after every refresh the MV content must equal a full
recompute of the view SQL. This exercises the whole r11 surface at
once: pair-lineage eq-delete commits, cross-term netting, equi-join
delta-key arm pruning, rid-trust, storage tombstone consolidation, and
the appends-only/changelog path routing — interactions directed tests
can't enumerate."""

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


@pytest.mark.slow
@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(ops=st.lists(_op, min_size=4, max_size=9))
def test_join_mv_random_op_sequences_match_recompute(spark, tmp_path_factory, ops):
    tmp = tmp_path_factory.mktemp("jfz")
    eng = Engine(spark, warehouse=str(tmp / "wh"))
    a = eng.create_table(
        "jf.a",
        spark.range(1).select(
            F.col("id").alias("k"), F.col("id").alias("fk"), F.col("id").alias("av")
        ).schema,
        properties={"write.eq-delete.target-rows": "3", "write.delete.target-rows": "5"},
    )
    b = eng.create_table(
        "jf.b",
        spark.range(1).select(F.col("id").alias("fk"), F.col("id").alias("bv")).schema,
    )
    a.append(
        spark.range(12).select(
            F.col("id").alias("k"), (F.col("id") % 6).alias("fk"), (F.col("id") * 10).alias("av")
        )
    )
    b.append(spark.range(6).select(F.col("id").alias("fk"), (F.col("id") * 100).alias("bv")))
    eng.create_materialized_view("jf.mv", _SQL)
    next_k, next_fk = 1000, 6

    def check():
        got = sorted(
            (r.k, r.av, r.bv) for r in eng.scan_materialized_view("jf.mv").collect()
        )
        want = sorted((r.k, r.av, r.bv) for r in eng.sql(_SQL).collect())
        assert got == want, (ops,)

    for op in ops:
        kind = op[0]
        if kind == "append_a":
            n = op[1]
            a.append(
                spark.createDataFrame(
                    [(next_k + i, (next_k + i) % 6, (next_k + i) * 10) for i in range(n)],
                    "k long, fk long, av long",
                )
            )
            next_k += n
        elif kind == "append_b":
            n = op[1]
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
            # some updates land rows IN/OUT of the view's WHERE clause
            val = "-1" if op[1] % 3 == 0 else "av + 1"
            update_where(a, {"av": val}, f"k % 10 = {op[1]}", mode="merge-on-read")
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
