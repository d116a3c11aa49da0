"""Differential SQL fuzzing: randomly generated SELECTs run on BOTH Spark
and DuckDB over the same parquet tables must agree row-for-row.

The driver gate hash-matches 100+ FIXED queries; this extends the
relational surface's coverage to a generated space of
projection/filter/join/group-by/having/order-limit shapes. The grammar is
restricted to constructs with identical cross-engine semantics:
integer/string columns, COUNT/SUM/MIN/MAX on integers, inner joins on
keys, total ORDER BY before LIMIT — no floats (summation order), no
dialect-divergent functions."""

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

SF = "/root/testdata/sf0.001"

INT_COLS = ["o_orderkey", "o_custkey"]
STR_COLS = ["o_orderstatus", "o_orderpriority"]
ALL_COLS = INT_COLS + STR_COLS

_intlit = st.integers(min_value=0, max_value=3000)
_strlit = st.sampled_from(["O", "F", "P", "1-URGENT", "3-MEDIUM", "5-LOW"])
_cmp = st.sampled_from(["=", "<>", "<", "<=", ">", ">="])


@st.composite
def _predicate(draw):
    clauses = []
    for _ in range(draw(st.integers(1, 3))):
        if draw(st.booleans()):
            clauses.append(f"{draw(st.sampled_from(INT_COLS))} {draw(_cmp)} {draw(_intlit)}")
        else:
            clauses.append(f"{draw(st.sampled_from(STR_COLS))} {draw(_cmp)} '{draw(_strlit)}'")
    return f" WHERE {' AND '.join(clauses) if draw(st.booleans()) else ' OR '.join(clauses)}"


@st.composite
def _select(draw):
    """One random query string valid in both dialects over view `orders`
    (optionally joined to `customer`)."""
    join = draw(st.booleans())
    src = "orders JOIN customer ON o_custkey = c_custkey" if join else "orders"
    pred = draw(st.one_of(st.just(""), _predicate()))
    shape = draw(st.integers(0, 10))
    if shape == 5:  # IN / NOT IN subquery (semi/anti through the optimizer)
        neg = draw(st.sampled_from(["", "NOT "]))
        k = draw(st.integers(0, 25))
        return (
            f"SELECT o_orderkey FROM orders{pred}"
            f"{' AND' if pred else ' WHERE'} o_custkey {neg}IN "
            f"(SELECT c_custkey FROM customer WHERE c_nationkey < {k})"
        )
    if shape == 6:  # correlated [NOT] EXISTS
        neg = draw(st.sampled_from(["", "NOT "]))
        k = draw(st.integers(0, 25))
        return (
            f"SELECT o_orderkey FROM orders o WHERE {neg}EXISTS "
            f"(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey "
            f"AND c.c_nationkey < {k})"
        )
    if shape == 8:  # ROLLUP hierarchy (NULL indicator rows cross-engine).
        # No WHERE: a predicate that empties the input exposes a known
        # SPARK deviation from the standard (0 rows instead of the ()
        # grouping's grand-total row) — pinned in
        # test_rollup_empty_input_divergence below.
        return (
            "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt, "
            "SUM(o_orderkey) AS s FROM orders "
            "GROUP BY ROLLUP(o_orderstatus, o_orderpriority)"
        )
    if shape == 9:  # scalar subquery in the projection
        agg = draw(st.sampled_from(["MIN", "MAX", "COUNT"]))
        return (
            f"SELECT o_orderkey, (SELECT {agg}(c_nationkey) FROM customer "
            f"WHERE c_custkey = o_custkey) AS snk FROM orders{pred}"
        )
    if shape == 10:  # aggregate over a derived aggregate (two-level shuffle)
        return (
            "SELECT cnt, COUNT(*) AS n, MIN(o_custkey) AS mn FROM "
            f"(SELECT o_custkey, COUNT(*) AS cnt FROM orders{pred} GROUP BY o_custkey) "
            "GROUP BY cnt"
        )
    if shape == 7:  # LEFT JOIN null handling
        k = draw(st.integers(0, 25))
        return (
            "SELECT o_orderkey, COALESCE(c_nationkey, -1) AS nk FROM orders "
            f"LEFT JOIN customer ON o_custkey = c_custkey AND c_nationkey < {k}"
        )
    if shape == 2:  # window over a unique order key → deterministic
        wf = draw(
            st.sampled_from(
                [
                    "ROW_NUMBER() OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)",
                    "RANK() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey)",
                    "SUM(o_custkey) OVER (PARTITION BY o_orderstatus)",
                    "LAG(o_orderkey, 1) OVER (PARTITION BY o_orderstatus ORDER BY o_orderkey)",
                ]
            )
        )
        return f"SELECT o_orderkey, {wf} AS w FROM {src}{pred}"
    if shape == 3:  # set ops over deterministic key sets
        op = draw(st.sampled_from(["UNION", "INTERSECT", "EXCEPT"]))
        pa, pb = draw(_predicate()), draw(_predicate())
        return (
            f"SELECT o_orderkey FROM orders{pa} {op} SELECT o_orderkey FROM orders{pb}"
        )
    if shape == 4:  # CASE projection
        return (
            "SELECT o_orderkey, CASE WHEN o_custkey % 2 = 0 THEN 'even' "
            f"WHEN o_custkey % 3 = 0 THEN 'tri' ELSE 'other' END AS bucket FROM {src}{pred}"
        )
    if shape == 0:  # aggregate shape
        g = draw(st.sampled_from(STR_COLS + (["c_mktsegment"] if join else [])))
        aggs = draw(
            st.lists(
                st.sampled_from(
                    [
                        "COUNT(*) AS cnt",
                        "SUM(o_orderkey) AS s1",
                        "MIN(o_orderkey) AS mn",
                        "MAX(o_custkey) AS mx",
                        "COUNT(DISTINCT o_custkey) AS dc",
                    ]
                ),
                min_size=1,
                max_size=3,
                unique=True,
            )
        )
        having = f" HAVING COUNT(*) > {draw(st.integers(0, 5))}" if draw(st.booleans()) else ""
        return f"SELECT {g}, {', '.join(aggs)} FROM {src}{pred} GROUP BY {g}{having}"
    cols = draw(st.lists(st.sampled_from(ALL_COLS), min_size=1, max_size=3, unique=True))
    q = f"SELECT {', '.join(cols)} FROM {src}{pred}"
    if draw(st.booleans()):  # total order + limit is cross-engine deterministic
        q += f" ORDER BY {', '.join(cols)} LIMIT {draw(st.integers(1, 50))}"
    return q


@pytest.fixture(scope="module")
def engines(spark):
    for t in ("orders", "customer"):
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return spark, con


@settings(
    max_examples=500,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(q=_select())
@pytest.mark.slow
def test_generated_sql_matches_duckdb(engines, q):
    # LIMIT prefixes are deterministic because the grammar orders by every
    # selected column (a total order over the projected tuple)
    spark, con = engines
    key = lambda t: tuple((v is None, v) for v in t)  # None-safe total order
    got = sorted((tuple(r) for r in spark.sql(q).collect()), key=key)
    want = sorted((tuple(r) for r in con.execute(q).fetchall()), key=key)
    assert got == want, q


# --------------------------------------------------------------------------
# Same idea aimed at the ICEBERG scan/pruning stack: random predicates
# against an engine-written month-partitioned table must return exactly
# DuckDB's answer over the source parquet. Every predicate exercises
# manifest-level FieldSummary pruning + file-level stats pruning + the
# residual Spark filter; wrong-answer pruning bugs (the r3 NaN class) live
# exactly here.
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def iceberg_orders(spark, tmp_path_factory):
    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.metadata.schema import Schema

    src = spark.read.parquet(f"{SF}/orders.parquet")
    eng = Engine(spark, warehouse=str(tmp_path_factory.mktemp("fuzzwh")))
    t = eng.create_table(
        "fz.orders", Schema.from_spark(src.schema), partition_by=[("o_orderdate", "month")]
    )
    # three appends → several manifests/files, so pruning has real fan-out
    t.append(src.where("o_orderkey % 3 = 0"))
    t.append(src.where("o_orderkey % 3 = 1"))
    t.append(src.where("o_orderkey % 3 = 2"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    return t, con


_ts = st.sampled_from(
    ["1995-01-01", "1996-06-15", "1997-03-01", "1997-11-30", "1998-08-01"]
)


@st.composite
def _scan_predicate(draw):
    kind = draw(st.integers(0, 4))
    if kind == 0:
        return f"o_orderdate {draw(_cmp)} TIMESTAMP '{draw(_ts)} 00:00:00'"
    if kind == 1:
        return f"o_orderkey {draw(_cmp)} {draw(_intlit)}"
    if kind == 2:
        return f"o_orderstatus {draw(_cmp)} '{draw(st.sampled_from(['O', 'F', 'P']))}'"
    if kind == 3:
        a = f"o_orderdate {draw(_cmp)} TIMESTAMP '{draw(_ts)} 00:00:00'"
        b = f"o_custkey {draw(_cmp)} {draw(_intlit)}"
        return f"{a} {draw(st.sampled_from(['AND', 'OR']))} {b}"
    return f"o_orderkey IN ({draw(_intlit)}, {draw(_intlit)}, {draw(_intlit)})"


@settings(
    max_examples=250,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pred=_scan_predicate())
@pytest.mark.slow
def test_iceberg_scan_pruning_matches_duckdb(iceberg_orders, pred):
    t, con = iceberg_orders
    got = sorted(r.o_orderkey for r in t.scan(pred).select("o_orderkey").collect())
    want = sorted(r[0] for r in con.execute(f"SELECT o_orderkey FROM orders WHERE {pred}").fetchall())
    assert got == want, pred


# --------------------------------------------------------------------------
# Runtime join-key file pruning (table/runtime_filter.py): for RANDOM dim
# key sets, Table.join_scan over the engine table must return exactly the
# plain SQL join's rows — through BOTH probe shapes (IN-set under max_keys,
# min/max range above it) and combined with a random extra predicate.
# --------------------------------------------------------------------------


@st.composite
def _dim_spec(draw):
    lo = draw(st.integers(0, 1400))
    width = draw(st.integers(1, 300))
    step = draw(st.sampled_from([1, 3, 7]))
    max_keys = draw(st.sampled_from([4, 10_000]))  # force range / IN-set paths
    pred = draw(st.one_of(st.just(None), st.just("o_orderkey > 1500")))
    return lo, lo + width, step, max_keys, pred


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(spec=_dim_spec())
@pytest.mark.slow
def test_join_scan_matches_plain_join(iceberg_orders, spec):
    lo, hi, step, max_keys, pred = spec
    t, con = iceberg_orders
    spark = t.spark
    keys = list(range(lo, hi, step))
    dim = spark.createDataFrame([(k,) for k in keys], "o_custkey bigint")
    got = sorted(
        r.o_orderkey
        for r in t.join_scan(dim, "o_custkey", predicate=pred, max_keys=max_keys)
        .select("o_orderkey")
        .collect()
    )
    extra = f" AND {pred}" if pred else ""
    want = sorted(
        r[0]
        for r in con.execute(
            f"SELECT o_orderkey FROM orders WHERE o_custkey IN "
            f"({', '.join(map(str, keys))}){extra}"
        ).fetchall()
    )
    assert got == want, spec


def test_rollup_empty_input_divergence(engines):
    """Fuzz finding (round 5, pinned): GROUP BY ROLLUP over EMPTY input.
    The SQL standard expands ROLLUP(a, b) to GROUPING SETS((a,b),(a),())
    and the () set over empty input yields one grand-total row (COUNT=0) —
    DuckDB does this; SPARK returns zero rows. Engine-semantics
    divergence in Spark itself, not this repo; pinned so a Spark upgrade
    that fixes it gets noticed (the fuzz grammar avoids the case)."""
    spark, con = engines
    q = (
        "SELECT o_orderstatus, COUNT(*) AS cnt FROM orders "
        "WHERE o_orderstatus = 'NO_SUCH' GROUP BY ROLLUP(o_orderstatus)"
    )
    assert spark.sql(q).count() == 0  # Spark: no rows
    assert len(con.execute(q).fetchall()) == 1  # DuckDB: standard grand total


# --------------------------------------------------------------------------
# Same pruning fuzz over a DELETION-VECTOR table: random predicates on a
# month-partitioned table with roaring-DV merge-on-read deletes must equal
# DuckDB over (source MINUS deleted). Exercises DV decode + anti-join +
# two-level pruning together — resurrect/over-delete bugs live here.
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def iceberg_dv_orders(spark, tmp_path_factory):
    from iceberg_rust_custom_spark.engine import Engine
    from iceberg_rust_custom_spark.metadata.schema import Schema
    from iceberg_rust_custom_spark.table.maintenance import delete_where
    from iceberg_rust_custom_spark.table.scan import plan_delete_files

    src = spark.read.parquet(f"{SF}/orders.parquet")
    eng = Engine(spark, warehouse=str(tmp_path_factory.mktemp("fuzzdv")))
    t = eng.create_table(
        "fz.orders_dv", Schema.from_spark(src.schema), partition_by=[("o_orderdate", "month")]
    )
    t.metadata = t.new_transaction().set_properties({"write.delete.format": "dv"}).commit()
    t.append(src.where("o_orderkey % 2 = 0"))
    t.append(src.where("o_orderkey % 2 = 1"))
    delete_where(t, "o_custkey <= 300", mode="merge-on-read")
    delete_where(t, "o_totalprice > 400000", mode="merge-on-read")  # stacked DVs
    dels = plan_delete_files(t.metadata, t.metadata.snapshot_for_ref())
    assert dels and all(e.data_file.file_format == "puffin" for e in dels)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders_dv AS SELECT * FROM '{SF}/orders.parquet' "
        "WHERE NOT (o_custkey <= 300) AND NOT (o_totalprice > 400000)"
    )
    return t, con


@settings(
    max_examples=120,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(pred=_scan_predicate())
@pytest.mark.slow
def test_dv_scan_pruning_matches_duckdb(iceberg_dv_orders, pred):
    t, con = iceberg_dv_orders
    got = sorted(r.o_orderkey for r in t.scan(pred).select("o_orderkey").collect())
    want = sorted(
        r[0] for r in con.execute(f"SELECT o_orderkey FROM orders_dv WHERE {pred}").fetchall()
    )
    assert got == want, pred
